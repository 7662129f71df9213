"""Versioned COW table: snapshot isolation + time travel over the bucketed
upsert layout — Delta's transaction log reduced to its minimum viable core:

- data files are immutable, written once under ``data/v{N}/_part={P}/``;
- each version has a JSON MANIFEST mapping bucket → the exact file list that
  version reads; a merge writes new files ONLY for impacted buckets and the
  new manifest re-references the previous version's files for every other
  bucket — unchanged data is shared between snapshots, never copied;
- the manifest is written via atomic rename (``os.replace``), so a reader
  never observes a half-written version; the newest manifest is the current
  table, older manifests stay readable (time travel) until vacuumed;
- ``vacuum`` drops manifests older than the last K versions and deletes data
  files no surviving manifest references (a file written at v1 and still
  referenced by v5 survives v1's vacuum — reference-counted GC, not
  age-of-file GC).

At 100 TB this layout is the difference between "a merge rewrites impacted
buckets" (sources/upsert.py) and "a merge is also UNDOABLE and concurrent
readers keep a consistent snapshot". Buckets are recomputable from the key
hash, so manifests carry only file paths — no per-row index. (The reference
has no persistent tables at all; this is Spark-first capability, not a
port.)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.sources.upsert import PART_COL, _bucket

_MANIFEST_DIR = "_versions"


def _manifest_file(path: str, version: int) -> str:
    return f"{path}/{_MANIFEST_DIR}/v{version}.json"


def _write_manifest(path: str, version: int, manifest: dict) -> None:
    os.makedirs(f"{path}/{_MANIFEST_DIR}", exist_ok=True)
    tmp = tempfile.NamedTemporaryFile(
        "w", dir=f"{path}/{_MANIFEST_DIR}", suffix=".tmp", delete=False
    )
    with tmp as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp.name, _manifest_file(path, version))


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_file(path, version)) as f:
        return json.load(f)


def list_versions(path: str) -> list[int]:
    d = f"{path}/{_MANIFEST_DIR}"
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
    )


def current_version(path: str) -> int:
    vs = list_versions(path)
    if not vs:
        raise FileNotFoundError(f"no versions at {path}")
    return vs[-1]


def _list_part_files(version_dir: str) -> dict[str, list[str]]:
    """bucket (as str) → file list for a freshly written data/v{N} tree."""
    out: dict[str, list[str]] = {}
    for d in sorted(os.listdir(version_dir)):
        if not d.startswith(f"{PART_COL}="):
            continue
        bucket = d.split("=", 1)[1]
        full = os.path.join(version_dir, d)
        out[bucket] = sorted(
            os.path.join(full, f) for f in os.listdir(full) if f.endswith(".parquet")
        )
    return out


def create_versioned(
    df: DataFrame, path: str, key: str, n_buckets: int
) -> int:
    """Materialize ``df`` as version 0 of a versioned COW table."""
    data_dir = f"{path}/data/v0"
    (
        df.withColumn(PART_COL, _bucket(key, n_buckets))
        .write.mode("overwrite")
        .partitionBy(PART_COL)
        .parquet(data_dir)
    )
    manifest = {
        "key": key,
        "n_buckets": n_buckets,
        "buckets": _list_part_files(data_dir),
    }
    _write_manifest(path, 0, manifest)
    return 0


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the exact file set version ``version`` (default:
    current) committed — concurrent merges create new files + manifests and
    cannot perturb this plan's input."""
    v = current_version(path) if version is None else version
    m = _read_manifest(path, v)
    files = [f for fl in m["buckets"].values() for f in fl]
    if not files:
        return spark.createDataFrame([], "doc_id long")  # fully-deleted table
    return spark.read.parquet(*files)


def merge_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    deletes: DataFrame | None = None,
) -> int:
    """MERGE INTO producing a NEW version (same semantics as
    upsert.merge_into: update-wins upsert, deletes win over updates).
    Impacted buckets get new data files under ``data/v{N+1}``; every other
    bucket entry is carried over from version N by reference. Returns the
    new version number."""
    v = current_version(path)
    m = _read_manifest(path, v)
    key, n_buckets = m["key"], int(m["n_buckets"])

    upd = updates.withColumn(PART_COL, _bucket(key, n_buckets))
    del_keys = None
    if deletes is not None:
        del_keys = deletes.select(key).withColumn(PART_COL, _bucket(key, n_buckets))
    parts_df = upd.select(PART_COL)
    if del_keys is not None:
        parts_df = parts_df.unionByName(del_keys.select(PART_COL))
    impacted = sorted(r[PART_COL] for r in parts_df.distinct().collect())

    base_files = [f for p in impacted for f in m["buckets"].get(str(p), [])]
    if base_files:
        base = spark.read.parquet(*base_files).withColumn(
            PART_COL, _bucket(key, n_buckets)
        )
    else:
        base = upd.limit(0)
    drop = upd.select(key)
    if del_keys is not None:
        drop = drop.unionByName(del_keys.select(key))
    keep = base.join(drop.distinct(), on=key, how="left_anti")
    surviving_upd = (
        upd if del_keys is None else upd.join(del_keys.select(key), on=key, how="left_anti")
    )
    merged = keep.unionByName(surviving_upd)

    new_v = v + 1
    data_dir = f"{path}/data/v{new_v}"
    merged.write.mode("overwrite").partitionBy(PART_COL).parquet(data_dir)

    buckets = dict(m["buckets"])  # carry everything over by reference...
    new_files = _list_part_files(data_dir)
    for p in impacted:  # ...then swap in (or delete) the impacted entries
        sp = str(p)
        if sp in new_files:
            buckets[sp] = new_files[sp]
        else:
            buckets.pop(sp, None)  # bucket fully deleted in this version
    _write_manifest(path, new_v, {"key": key, "n_buckets": n_buckets, "buckets": buckets})
    return new_v


def compact_versioned(
    spark: SparkSession, path: str, max_files_per_bucket: int = 4
) -> int:
    """Compaction COMMIT: buckets whose current file list exceeds the bound
    are rewritten into one file each and published as a NEW version whose
    manifest swaps in the compacted lists; every other bucket is carried
    over by reference, byte-identical. Data is unchanged (rows verbatim —
    diff_versions between the two versions is empty), so readers pinned to
    older snapshots are unaffected, and ``vacuum`` reclaims the fragmented
    files once their versions expire — the same commit/GC machinery the
    merges use, reused for maintenance. Fragmentation source: each merge
    writes impacted buckets with as many files as write tasks. Returns the
    new version (or the current one if nothing exceeded the bound)."""
    v = current_version(path)
    m = _read_manifest(path, v)
    key, n_buckets = m["key"], int(m["n_buckets"])
    frag = {p: fl for p, fl in m["buckets"].items() if len(fl) > max_files_per_bucket}
    if not frag:
        return v
    files = [f for fl in frag.values() for f in fl]
    df = (
        spark.read.parquet(*files)
        .withColumn(PART_COL, _bucket(key, n_buckets))
        # one task per fragmented bucket → one output file per bucket dir
        .repartition(len(frag), F.col(PART_COL))
    )
    new_v = v + 1
    data_dir = f"{path}/data/v{new_v}"
    df.write.mode("overwrite").partitionBy(PART_COL).parquet(data_dir)
    buckets = dict(m["buckets"])
    buckets.update(_list_part_files(data_dir))
    _write_manifest(path, new_v, {"key": key, "n_buckets": n_buckets, "buckets": buckets})
    return new_v


def vacuum(path: str, keep_last: int = 1) -> int:
    """Drop manifests older than the newest ``keep_last`` versions and
    delete data files no surviving manifest references. Returns the number
    of files deleted."""
    vs = list_versions(path)
    kept, dropped = vs[-keep_last:], vs[:-keep_last]
    referenced: set[str] = set()
    for v in kept:
        m = _read_manifest(path, v)
        for fl in m["buckets"].values():
            referenced.update(os.path.abspath(f) for f in fl)
    removed = 0
    data_root = f"{path}/data"
    for vdir in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        full_v = os.path.join(data_root, vdir)
        for root, _dirs, files in os.walk(full_v, topdown=False):
            for f in files:
                fp = os.path.abspath(os.path.join(root, f))
                if f.endswith(".parquet") and fp not in referenced:
                    os.remove(fp)
                    removed += 1
            if not os.listdir(root):
                shutil.rmtree(root, ignore_errors=True)
    for v in dropped:
        os.remove(_manifest_file(path, v))
    return removed


def diff_versions(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Snapshot CHANGELOG: (key, action ∈ insert/delete/update) between two
    committed versions — the CDC-read face of the COW table (time travel
    answers "what was"; diff answers "what changed").

    Scale shape — file-identity pruning: a bucket whose manifest entry lists
    the SAME files in both versions cannot contain a change (COW never
    rewrites a file in place), so the diff reads ONLY buckets whose file
    lists differ. Cost is proportional to churn, not table size — the same
    impacted-bucket discipline merge_versioned writes with, replayed at
    read time. Within changed buckets: full-outer join on the key, rows
    classified by presence and by md5 of the canonical JSON of their
    non-key payload (engine-stable change detection)."""
    ma, mb = _read_manifest(path, v_from), _read_manifest(path, v_to)
    key = ma["key"]
    changed = [
        p
        for p in set(ma["buckets"]) | set(mb["buckets"])
        if ma["buckets"].get(p) != mb["buckets"].get(p)
    ]
    a_files = [f for p in changed for f in ma["buckets"].get(p, [])]
    b_files = [f for p in changed for f in mb["buckets"].get(p, [])]

    def _read(files: list[str]) -> DataFrame | None:
        return spark.read.parquet(*files) if files else None

    a, b = _read(a_files), _read(b_files)
    if a is None and b is None:
        return spark.createDataFrame([], f"{key} long, action string")
    if a is None or b is None:
        side, action = (b, "insert") if a is None else (a, "delete")
        return side.select(F.col(key), F.lit(action).alias("action"))

    def _fp(df: DataFrame, out: str) -> DataFrame:
        payload = F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns) if c != key]))
        return df.select(F.col(key), F.md5(payload).alias(out))

    joined = _fp(a, "fp_a").join(_fp(b, "fp_b"), on=key, how="full_outer")
    action = (
        F.when(F.col("fp_a").isNull(), "insert")
        .when(F.col("fp_b").isNull(), "delete")
        .when(F.col("fp_a") != F.col("fp_b"), "update")
    )
    return (
        joined.withColumn("action", action)
        .filter(F.col("action").isNotNull())
        .select(F.col(key), "action")
    )
