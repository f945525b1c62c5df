"""WARC-lite source: roundtrip, gzip layout, truncation quarantine, the
binaryFile Spark reader, and the payload-table bridge."""

from __future__ import annotations

import os

import pytest

from web_scraper_spark import datagen
from web_scraper_spark.functions.imaging import decode_image, phash64
from web_scraper_spark.sources.warc import (
    parse_warc,
    payload_from_warc,
    read_warc,
    write_warc,
)


def _recs():
    return datagen.warc_records_for()


def test_roundtrip_plain_and_gzip():
    recs = _recs()
    for compress in (False, True):
        got = parse_warc(write_warc(recs, compress=compress), "f")
        assert len(got) == len(recs)
        for r, g in zip(recs, got):
            assert g["error"] is None
            assert g["url"] == r["url"]
            assert g["http_status"] == r["status"]
            assert g["content_type"] == r["content_type"]
            assert bytes(g["payload"]) == r["payload"]


def test_truncated_record_quarantines_rest_of_file():
    blob = write_warc(_recs()[:4])
    cut = blob[: len(blob) - 30]  # truncate inside the last record
    got = parse_warc(cut, "f")
    assert len(got) == 4
    assert [g["error"] for g in got[:3]] == [None, None, None]
    assert "truncated" in got[3]["error"]


def test_read_warc_over_files(spark, tmp_path):
    for name, blob in datagen.gen_warc_files().items():
        (tmp_path / name).write_bytes(blob)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == len(_recs())
    assert all(r["error"] is None for r in rows)
    # both layouts contribute; paths are real file URIs
    files = {os.path.basename(r["warc_file"]) for r in rows}
    assert files == {"crawl-000.warc", "crawl-001.warc.gz"}


def test_payload_bridge_matches_payload_table(spark, tmp_path):
    """payload_from_warc keeps exactly the 200-status image records, maps
    them onto the payload shape, and the decoded phashes equal the payload
    table's — the archived crawl IS the live crawl, byte for byte."""
    for name, blob in datagen.gen_warc_files().items():
        (tmp_path / name).write_bytes(blob)
    bridged = payload_from_warc(read_warc(spark, str(tmp_path))).collect()
    assert len(bridged) == datagen.N_WARC_IMAGES

    truth = {
        r["image_id"]: r
        for _, r in datagen.gen_payload_pdf(datagen.N_WARC_IMAGES).iterrows()
    }
    for r in bridged:
        t = truth[r["image_id"]]
        assert bytes(r["bytes"]) == bytes(t["bytes"])
        assert r["fmt"] == t["fmt"]
        assert phash64(decode_image(bytes(r["bytes"]), r["fmt"])) == t["phash"]


def test_non_warc_bytes_yield_error_row():
    got = parse_warc(b"this is not a warc file at all, not even close!!", "f")
    assert len(got) == 1 and "no WARC magic" in got[0]["error"]
