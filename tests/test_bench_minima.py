"""Pins bench.py's per-line floor-reset semantics (VERDICT r10 #1): the
cross-round minima map must never claim a floor recorded for a kernel the
repo no longer ships. Three rules under test:

1. a stamped sample merges iff its fingerprint equals the current one;
2. a pre-stamp legacy sample merges unless the line is in
   LEGACY_FLOOR_RESET (the declared stale set for kernels that changed
   before stamps existed — the three mm_* fingerprint lines);
3. fingerprints move on code changes, not comment/docstring edits, and
   cover the transitive vers_spark import closure (a shared-kernel edit
   resets every line that can execute it).

No Spark session needed — pure functions.
"""

from __future__ import annotations

import os
import sys
import tempfile
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_stamped_sample_merges_only_on_matching_fp():
    current = {"q": 5.0}
    fps = {"q": "aaa"}
    match = [({"q": 2.0}, {"q": "aaa"})]
    mismatch = [({"q": 1.0}, {"q": "bbb"})]
    assert bench._minima(dict(current), fps, match)["q"] == 2.0
    assert bench._minima(dict(current), fps, mismatch)["q"] == 5.0
    # both present: only the matching one lowers the floor
    assert bench._minima(dict(current), fps, mismatch + match)["q"] == 2.0


def test_legacy_sample_merges_unless_declared_stale():
    fps = {"mm_image_phash_neardup": "aaa", "q1_pricing_summary": "bbb"}
    current = {"mm_image_phash_neardup": 3.0, "q1_pricing_summary": 3.0}
    legacy = [({"mm_image_phash_neardup": 1.09, "q1_pricing_summary": 1.0}, None)]
    got = bench._minima(dict(current), fps, legacy)
    # the declared-stale line ignores the un-stamped 1.09 floor (the r10
    # minima-map trap); the ordinary line keeps its legacy floor
    assert got["mm_image_phash_neardup"] == 3.0
    assert got["q1_pricing_summary"] == 1.0
    assert "mm_image_phash_neardup" in bench.LEGACY_FLOOR_RESET


def test_unknown_lines_and_bad_values_are_ignored():
    fps = {"q": "aaa"}
    srcs = [({"other": 0.1, "q": "not-a-number"}, None)]
    assert bench._minima({"q": 4.0}, fps, srcs) == {"q": 4.0}


def test_module_sha_ignores_comments_and_docstrings_moves_on_code():
    def sha_of(body: str) -> str:
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(textwrap.dedent(body))
            path = f.name
        try:
            bench._module_code_sha.__defaults__[0].pop(path, None)
            return bench._module_code_sha(path)
        finally:
            os.unlink(path)

    base = sha_of('"""doc."""\ndef f(x):\n    return x + 1\n')
    commented = sha_of(
        '"""other doc."""\n# a comment\ndef f(x):\n    """fn doc."""\n    return x + 1\n'
    )
    changed = sha_of('"""doc."""\ndef f(x):\n    return x + 2\n')
    assert base == commented
    assert base != changed


def test_line_fp_covers_shared_kernel_closure():
    """The three mm_* lines' fingerprints must cover pipeline_queries AND
    its lazily-imported kernels (media_codecs, functions/vector) — the
    modules whose r10/r11 edits motivated the reset."""
    closure = bench._vers_import_closure("vers_spark.operators.pipeline_queries")
    names = {os.path.relpath(p, os.path.dirname(os.path.abspath(bench.__file__))) for p in closure}
    assert "vers_spark/operators/pipeline_queries.py" in names
    assert "vers_spark/operators/media_codecs.py" in names
    assert "vers_spark/functions/vector.py" in names


def test_line_fps_resolve_through_tuned_wrapper():
    """queries() wraps every fn; _line_fps must fingerprint the DEFINING
    module (vers_spark.*), not __spark_entry__ — and be deterministic."""
    import __spark_entry__ as e

    qmap = e.queries()
    names = ["q1_pricing_summary", "mm_image_phash_neardup"]
    fps = bench._line_fps(qmap, names)
    assert set(fps) == set(names)
    assert all(len(v) == 12 for v in fps.values())
    assert fps == bench._line_fps(qmap, names)
    # different defining closures → (overwhelmingly) different stamps is
    # not guaranteed in general, but these two differ by whole modules
    assert fps["q1_pricing_summary"] != fps["mm_image_phash_neardup"]
