"""sources.staging contract: stable per-app paths, liveness-gated pruning,
ephemeral scratch."""

from __future__ import annotations

import os
import time

from vers_spark.sources.staging import (
    _STALE_SECONDS,
    _owner_alive,
    ephemeral_dir,
    fresh_subdir,
    staging_dir,
)


def test_staging_dir_stable_within_app(spark, tmp_path):
    a = staging_dir(spark, "t_stable", str(tmp_path))
    b = staging_dir(spark, "t_stable", str(tmp_path))
    assert a == b and os.path.isdir(a)
    assert f"_{os.getpid()}" in os.path.basename(a)


def test_fresh_subdir_clears(spark, tmp_path):
    p = fresh_subdir(spark, "t_fresh", str(tmp_path), "sub")
    os.makedirs(p)
    open(os.path.join(p, "stale.txt"), "w").close()
    p2 = fresh_subdir(spark, "t_fresh", str(tmp_path), "sub")
    assert p2 == p and not os.path.exists(p)


def test_prune_removes_dead_owner_keeps_live(spark, tmp_path):
    """A >2h-stale sibling is pruned only when its embedded pid is gone; a
    stale-looking dir owned by a LIVE process survives (the mid-read
    deletion contract)."""
    mine = staging_dir(spark, "t_prune", str(tmp_path))
    parent = os.path.dirname(mine)
    old = time.time() - _STALE_SECONDS - 60
    # dead sibling: pid 2^22+5 is above kernel.pid_max defaults → never alive
    dead = os.path.join(parent, "local-000_4194309")
    # live sibling: our own pid under a different app id
    live = os.path.join(parent, "local-111_%d" % os.getpid())
    for d in (dead, live):
        os.makedirs(d, exist_ok=True)
        os.utime(d, (old, old))
    staging_dir(spark, "t_prune", str(tmp_path))  # triggers the pruning pass
    assert not os.path.exists(dead)
    assert os.path.exists(live)


def test_owner_alive_parses():
    assert _owner_alive("local-123_%d" % os.getpid())
    assert not _owner_alive("local-123_4194309")
    assert _owner_alive("no-pid-suffix")  # unparseable → never delete


def test_ephemeral_dir_unique_per_call():
    a = ephemeral_dir("vs_test_eph_")
    b = ephemeral_dir("vs_test_eph_")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)


def test_ephemeral_dir_prunes_dead_owner_orphans():
    """A killed process never runs atexit; its pid-tagged ephemeral dirs are
    pruned by the next caller. Live-owner and unparseable (pre-pid-format)
    names are never touched."""
    import tempfile as _tf

    base = (
        "/dev/shm/vs-scratch"
        if os.path.isdir("/dev/shm")
        else os.path.join(_tf.gettempdir(), "vs-scratch")
    )
    os.makedirs(base, exist_ok=True)
    dead = os.path.join(base, "vs_test_pid4194309.orphan")
    live = os.path.join(base, "vs_test_pid%d.mine" % os.getpid())
    legacy = os.path.join(base, "vs_test_nopid_suffix")
    for d in (dead, live, legacy):
        os.makedirs(d, exist_ok=True)
    ephemeral_dir("vs_test_prune_")
    assert not os.path.exists(dead)
    assert os.path.exists(live)
    assert os.path.exists(legacy)
    for d in (live, legacy):
        os.rmdir(d)


def test_ephemeral_dir_name_embeds_pid():
    d = ephemeral_dir("vs_test_tag_")
    assert f"pid{os.getpid()}." in os.path.basename(d)
