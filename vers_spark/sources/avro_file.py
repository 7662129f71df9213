"""Avro source/sink (SURVEY §9.5 backlog item).

Two paths, same API:

- When the ``spark-avro`` datasource module is on the classpath (any real
  deployment: ``--packages org.apache.spark:spark-avro_2.13:<ver>``), reads
  and writes delegate to ``format("avro")`` — the JVM-side, pushdown-capable
  fast path.
- When it is not (this sandbox ships Spark without the module), a
  self-contained OCF (Avro Object Container File, null codec) codec runs
  INSIDE executor tasks: writes via one file per partition out of
  ``mapInPandas``, reads via ``binaryFile`` + per-file decode in
  ``mapInPandas``. Flat record schemas of {long,int,double,boolean,string,
  bytes} (plus their nullable unions) only — enough for tabular corpora; at
  scale you install the module instead (documented, not a silent cap).

The fallback is a real distributed connector — each task touches only its
own files, the driver never sees row data — but the decode loop is Python
per row, so it is the compatibility path, not the perf path.
"""

from __future__ import annotations

import io
import json
import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SYNC = bytes(range(16))  # fixed sync marker: deterministic files

_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "binary": "bytes",
}


_HAS_AVRO: dict[int, bool] = {}


def has_spark_avro(spark: SparkSession) -> bool:
    """True when the spark-avro datasource module resolves through Spark's
    own datasource lookup (classname probes false-positive on the core
    avro-* jars every distribution ships)."""
    key = id(spark)
    if key not in _HAS_AVRO:
        try:
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
                "avro", spark._jsparkSession.sessionState().conf()  # noqa: SLF001
            )
            _HAS_AVRO[key] = True
        except Exception:
            _HAS_AVRO[key] = False
    return _HAS_AVRO[key]


# ---------------- binary primitives (Avro spec §binary encoding) ----------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _avro_schema(fields: list[tuple[str, str, bool]]) -> dict:
    def t(avro_type: str, nullable: bool):
        return ["null", avro_type] if nullable else avro_type

    return {
        "type": "record",
        "name": "vers_spark_record",
        "fields": [{"name": n, "type": t(a, nul)} for n, a, nul in fields],
    }


def _write_value(out: io.BytesIO, v, avro_type: str, nullable: bool) -> None:
    if nullable:
        if v is None:
            out.write(_zigzag_encode(0))
            return
        out.write(_zigzag_encode(1))
    if avro_type in ("long", "int"):
        out.write(_zigzag_encode(int(v)))
    elif avro_type == "double":
        out.write(struct.pack("<d", float(v)))
    elif avro_type == "float":
        out.write(struct.pack("<f", float(v)))
    elif avro_type == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif avro_type == "string":
        b = str(v).encode("utf-8")
        out.write(_zigzag_encode(len(b)) + b)
    elif avro_type == "bytes":
        b = bytes(v)
        out.write(_zigzag_encode(len(b)) + b)
    else:  # pragma: no cover
        raise ValueError(f"unsupported avro type {avro_type}")


def _read_value(buf: bytes, pos: int, avro_type: str, nullable: bool):
    if nullable:
        branch, pos = _zigzag_decode(buf, pos)
        if branch == 0:
            return None, pos
    if avro_type in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if avro_type == "boolean":
        return buf[pos] == 1, pos + 1
    if avro_type in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if avro_type == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported avro type {avro_type}")  # pragma: no cover


def _encode_ocf(rows: list[tuple], fields: list[tuple[str, str, bool]]) -> bytes:
    head = io.BytesIO()
    head.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(_avro_schema(fields)).encode(),
        "avro.codec": b"null",
    }
    head.write(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        head.write(_zigzag_encode(len(kb)) + kb)
        head.write(_zigzag_encode(len(v)) + v)
    head.write(_zigzag_encode(0))
    head.write(_SYNC)
    body = io.BytesIO()
    for row in rows:
        for v, (_, a, nul) in zip(row, fields):
            _write_value(body, v, a, nul)
    data = body.getvalue()
    head.write(_zigzag_encode(len(rows)))
    head.write(_zigzag_encode(len(data)))
    head.write(data)
    head.write(_SYNC)
    return head.getvalue()


def _decode_ocf(buf: bytes) -> tuple[list[tuple[str, str, bool]], list[tuple]]:
    assert buf[:4] == b"Obj\x01", "not an Avro object container file"
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        for _ in range(abs(n)):
            kl, pos = _zigzag_decode(buf, pos)
            k = buf[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(buf, pos)
            meta[k] = buf[pos : pos + vl]
            pos += vl
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError("fallback avro reader supports the null codec only")
    schema = json.loads(meta["avro.schema"])
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            nul = "null" in t
            t = next(x for x in t if x != "null")
        else:
            nul = False
        fields.append((f["name"], t, nul))
    sync = buf[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(buf):
        n_rows, pos = _zigzag_decode(buf, pos)
        n_bytes, pos = _zigzag_decode(buf, pos)
        end = pos + n_bytes
        for _ in range(n_rows):
            row = []
            for _, a, nul in fields:
                v, pos = _read_value(buf, pos, a, nul)
                row.append(v)
            rows.append(tuple(row))
        assert pos == end, "avro block length mismatch"
        assert buf[pos : pos + 16] == sync, "avro sync marker mismatch"
        pos += 16
    return fields, rows


# ---------------- Spark-facing API ----------------


def _fields_of(df: DataFrame) -> list[tuple[str, str, bool]]:
    out = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(
                f"avro fallback supports flat primitive columns, got {f.name}: {t}"
            )
        out.append((f.name, _SPARK_TO_AVRO[t], f.nullable))
    return out


def write_avro(df: DataFrame, path: str, n_files: int = 4) -> None:
    """Write ``df`` as Avro OCF files — spark-avro when available, else one
    null-codec file per partition written inside each task."""
    spark = df.sparkSession
    if has_spark_avro(spark):
        df.repartition(n_files).write.mode("overwrite").format("avro").save(path)
        return
    fields = _fields_of(df)
    cols = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    import pandas as pd

    def write_part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import uuid

        rows: list[tuple] = []
        for pdf in batches:
            for row in pdf[cols].itertuples(index=False, name=None):
                rows.append(tuple(None if pd.isna(v) else v for v in row))
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(fname, "wb") as fh:
            fh.write(_encode_ocf(rows, fields))
        yield pd.DataFrame({"file": [fname], "n_rows": [len(rows)]})

    # the aggregate is the action that drives the distributed write
    df.repartition(n_files).mapInPandas(
        write_part, "file string, n_rows long"
    ).agg(F.sum("n_rows")).collect()


def read_avro(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read Avro OCF files distributed: spark-avro when available, else
    ``binaryFile`` listing + per-file decode inside ``mapInPandas`` (each
    task decodes only its own files; the driver sees no row data)."""
    if has_spark_avro(spark):
        return spark.read.format("avro").schema(schema).load(path)

    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/*.avro").select("content")
    target = [f.strip().split(" ")[0] for f in schema.split(",")]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for blob in pdf["content"]:
                fields, rows = _decode_ocf(bytes(blob))
                names = [f[0] for f in fields]
                out = pd.DataFrame(rows, columns=names)
                yield out[target]

    return files.mapInPandas(decode, schema)
