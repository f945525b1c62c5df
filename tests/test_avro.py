"""Avro wire-format conformance for the Iceberg metadata layer.

The decoder here is INDEPENDENT of sources/avro.py — written directly
from the Avro 1.11 spec grammar (its own varint/zigzag, its own
container walk) — so a bug mirrored between the repo's encoder and
decoder cannot hide: these tests only pass if the emitted bytes are what
the SPEC says, not what sources/avro.py thinks.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from web_scraper_spark.sources.avro import write_ocf
from web_scraper_spark.sources.iceberg import IcebergSnapshotTable

# ------------------------------------------------ independent decoder


def _ivarint(data, pos):
    # spec: little-endian base-128 varint, zigzag-mapped longs
    acc, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            break
    return (acc >> 1) ^ -(acc & 1), pos


def _idecode(data, pos, schema):
    if isinstance(schema, list):
        idx, pos = _ivarint(data, pos)
        s = schema[idx]
        return (None, pos) if s == "null" else _idecode(data, pos, s)
    if schema in ("long", "int"):
        return _ivarint(data, pos)
    if schema == "boolean":
        return data[pos] != 0, pos + 1
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema in ("string", "bytes"):
        n, pos = _ivarint(data, pos)
        raw = data[pos : pos + n]
        return (raw.decode() if schema == "string" else raw), pos + n
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = _idecode(data, pos, f["type"])
        return out, pos
    if t == "array":
        items = []
        while True:
            n, pos = _ivarint(data, pos)
            if n == 0:
                return items, pos
            if n < 0:
                _bytes, pos = _ivarint(data, pos)
                n = -n
            for _ in range(n):
                v, pos = _idecode(data, pos, schema["items"])
                items.append(v)
    if t == "map":
        m = {}
        while True:
            n, pos = _ivarint(data, pos)
            if n == 0:
                return m, pos
            if n < 0:
                _bytes, pos = _ivarint(data, pos)
                n = -n
            for _ in range(n):
                k, pos = _idecode(data, pos, "string")
                m[k], pos = _idecode(data, pos, schema["values"])
    raise AssertionError(f"unexpected schema {schema}")


def independent_read_ocf(blob):
    assert blob[:4] == b"Obj\x01", "bad container magic"
    meta, pos = _idecode(blob, 4, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"])
    codec = meta["avro.codec"].decode()
    sync = blob[pos : pos + 16]
    pos += 16
    records = []
    while pos < len(blob):
        n, pos = _ivarint(blob, pos)
        size, pos = _ivarint(blob, pos)
        payload = blob[pos : pos + size]
        pos += size
        assert blob[pos : pos + 16] == sync, "block sync mismatch"
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        else:
            assert codec == "null"
        p = 0
        for _ in range(n):
            rec, p = _idecode(payload, p, schema)
            records.append(rec)
        assert p == len(payload), "trailing bytes in block"
    return schema, records, meta


# ------------------------------------------------------------- fixtures


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


@pytest.fixture
def ice(tmp_path):
    return IcebergSnapshotTable(str(tmp_path), "t")


# --------------------------------------------------------------- tests


def test_independent_decoder_reads_writer_output():
    schema = {
        "type": "record", "name": "x",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
        ],
    }
    recs = [{"a": -7, "b": "hi", "c": [1, 2, 3]}, {"a": 2**40, "b": None, "c": []}]
    for codec in ("null", "deflate"):
        _s, got, _m = independent_read_ocf(write_ocf(schema, recs, codec=codec))
        assert got == recs


def test_manifest_is_conforming_avro(spark, ice):
    ice.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]).repartition(2))
    snap = ice._current_snapshot(1)
    ml_path = os.path.join(ice._meta_dir, snap["manifest-list"])
    assert ml_path.endswith(".avro")
    schema, rows, meta = independent_read_ocf(open(ml_path, "rb").read())
    assert schema["name"] == "manifest_file"
    # spec field-ids present on every manifest-list field
    assert all("field-id" in f for f in schema["fields"])
    assert len(rows) == 1
    m = rows[0]
    man_path = os.path.join(ice._meta_dir, m["manifest_path"])
    assert m["manifest_length"] == os.path.getsize(man_path)
    assert m["added_files_count"] == 2 and m["added_rows_count"] == 2
    assert m["sequence_number"] == 1 and m["content"] == 0

    eschema, entries, emeta = independent_read_ocf(open(man_path, "rb").read())
    assert eschema["name"] == "manifest_entry"
    assert len(entries) == 2
    for e in entries:
        assert e["status"] == 1
        df = e["data_file"]
        assert df["file_format"] == "PARQUET"
        assert os.path.getsize(df["file_path"]) == df["file_size_in_bytes"]
    assert sum(e["data_file"]["record_count"] for e in entries) == 2


def test_bucketed_manifest_partition_summaries(spark, ice):
    from pyspark.sql import functions as F

    rows = [(i, "x") for i in range(8)]
    df = spark.createDataFrame(rows, "k int, v string").withColumn(
        "bucket", F.pmod("k", F.lit(2))
    )
    ice.commit_overwrite_bucketed(df, "bucket")
    snap = ice._current_snapshot(1)
    ml_path = os.path.join(ice._meta_dir, snap["manifest-list"])
    _s, rows_ml, _m = independent_read_ocf(open(ml_path, "rb").read())
    assert len(rows_ml) == 2
    for m in rows_ml:
        (summary,) = m["partitions"]
        lo = struct.unpack("<i", summary["lower_bound"])[0]
        hi = struct.unpack("<i", summary["upper_bound"])[0]
        assert lo == hi and lo in (0, 1)
        assert summary["contains_null"] is False
    # entries carry the bucket in the partition struct
    man = os.path.join(ice._meta_dir, rows_ml[0]["manifest_path"])
    _es, entries, _em = independent_read_ocf(open(man, "rb").read())
    assert all(e["data_file"]["partition"]["bucket"] in (0, 1) for e in entries)


def test_manifest_reuse_keeps_original_sequence_numbers(spark, ice):
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    ice.commit_append(_df(spark, [(2, "b")]))
    snap = ice._current_snapshot(2)
    _s, rows, _m = independent_read_ocf(
        open(os.path.join(ice._meta_dir, snap["manifest-list"]), "rb").read()
    )
    seqs = sorted(r["sequence_number"] for r in rows)
    assert seqs == [1, 2]  # reused manifest keeps seq 1, added one gets 2


def test_legacy_json_manifests_still_read(spark, ice):
    """Pre-Avro trees (r4 JSON manifests) remain readable: the read path
    dispatches on the file extension."""
    ice.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]))
    snap = ice._current_snapshot(1)
    mlist = ice._manifest_list(snap)
    man = ice._manifest(mlist[0]["manifest_path"])
    # rewrite this tree's metadata as the old JSON flavor
    ml_json = "snap-legacy.manifest-list.json"
    with open(os.path.join(ice._meta_dir, ml_json), "w") as f:
        json.dump({"manifests": mlist}, f)
    mj = "manifest-legacy.json"
    with open(os.path.join(ice._meta_dir, mj), "w") as f:
        json.dump(man, f)
    snap2 = dict(snap, **{"manifest-list": ml_json})
    got = ice._manifest_list(snap2)
    assert got[0]["manifest_path"] == mlist[0]["manifest_path"]
    got_man = ice._manifest(mj)
    assert got_man["entries"] == man["entries"]
