"""Live-HTTP origin end-to-end: the engine with ``attach_http_origin``
crawling a real localhost server (over real sockets, with fault injection
via status codes / aborted connections / truncated bodies) must produce
EXACTLY the schedule trace, seen set, failure state, and frontier statuses
of the synthetic-store engine on the same site graph + fault plan — and
must resume from a checkpoint in a fresh engine instance mid-crawl.

Reference parity: file_downloader.py:206-282 is the production download
path this exercises; the synthetic store (sources/store.fetch_and_validate)
is its deterministic stand-in everywhere else in the suite.
"""

from __future__ import annotations

import os
import re
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.plans.crawl import CrawlEngine

N_PAGES, VPP = 3, 18
N_ITEMS = N_PAGES * VPP
BATCH = 24


class _Handler(BaseHTTPRequestHandler):
    """Serves the datagen payload by image_id with per-attempt fault
    injection mirroring sources/store.fetch_and_validate's injector:

      network    → abort the connection before any response
      rate_limit → HTTP 429
      permanent  → HTTP 404
      temporary  → HTTP 503
      validation → 200 with the body truncated to max(len//2, 10)
                   (no-body edge: 200 with a sub-minimum stub so the
                   validator — not the transport — flags it, same as the
                   synthetic injector's drop message classing)

    The per-id request counter IS the attempt number: the engine issues
    exactly one GET per scheduled attempt.
    """

    def do_GET(self):  # noqa: N802 (http.server API)
        srv = self.server
        m = re.fullmatch(r"/d/(\w+)", self.path)
        if not m:
            self.send_error(404)
            return
        iid = m.group(1)
        with srv.lock:
            attempt = srv.counts.get(iid, 0)
            srv.counts[iid] = attempt + 1
        body = srv.payload.get(iid)
        fault = srv.faults.get(iid)
        if fault is not None and (int(fault[1]) == -1 or attempt < int(fault[1])):
            mode = fault[0]
            if mode == "network":
                try:
                    self.request.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                self.request.close()
                self.close_connection = True
                return
            if mode == "rate_limit":
                self.send_error(429)
                return
            if mode == "permanent":
                self.send_error(404)
                return
            if mode == "temporary":
                self.send_error(503)
                return
            # validation: truncate (or a sub-minimum stub when no body)
            chunk = body[: max(len(body) // 2, 10)] if body else b"xxxx"
            self._send_bytes(chunk)
            return
        if body is None:
            self.send_error(404)
            return
        self._send_bytes(body)

    def _send_bytes(self, chunk: bytes) -> None:
        self.send_response(200)
        self.send_header("Content-Length", str(len(chunk)))
        self.end_headers()
        self.wfile.write(chunk)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


class _Origin(ThreadingHTTPServer):
    def handle_error(self, request, client_address):
        pass  # aborted-connection faults raise in the handler thread by design


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    """One site graph whose URLs point at one localhost origin, the payload
    both origins serve, and the shared fault plan."""
    tmp_root = str(tmp_path_factory.mktemp("live_e2e"))
    payload_pdf = datagen.gen_payload_pdf(N_ITEMS)
    payload = {r.image_id: bytes(r.bytes) for r in payload_pdf.itertuples()}
    fpdf = datagen.gen_fault_plan_pdf(N_ITEMS, fail_rate=0.2)
    faults = {r.image_id: (r.fail_mode, int(r.fail_count)) for r in fpdf.itertuples()}

    srv = _Origin(("127.0.0.1", 0), _Handler)
    srv.payload, srv.faults, srv.counts, srv.lock = payload, faults, {}, threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    site_pdf = datagen.gen_site_graph_pdf(N_PAGES, VPP)
    site_pdf["url"] = [f"{base}/d/{iid}" for iid in site_pdf["image_id"]]
    site_pdf["host"] = "127.0.0.1"
    site = spark.createDataFrame(site_pdf, schema=schemas.SITE_GRAPH_SCHEMA)

    ppath = os.path.join(tmp_root, "origin_payload")
    spark.createDataFrame(payload_pdf, schema=schemas.PAYLOAD_SCHEMA).write.parquet(ppath)
    yield tmp_root, site, ppath, faults, srv
    srv.shutdown()


def _state(spark, eng):
    trace = [(r["seq"], r["url"], r["image_id"]) for r in eng.crawl_order(spark).collect()]
    seen = {
        r["url_hash"]: (r["image_id"], r["committed_seq"])
        for r in eng.seen_set(spark).collect()
    }
    fs = eng.failure_state(spark)
    failures = (
        {}
        if fs is None
        else {
            r["url_hash"]: (r["error_class"], r["attempts"], r["permanent"])
            for r in fs.collect()
        }
    )
    statuses = {
        r["status"]: r["count"]
        for r in eng.frontier.read(spark).groupBy("status").count().collect()
    }
    return trace, seen, failures, statuses


@pytest.fixture(scope="module")
def runs(spark, fixture):
    """Run the synthetic-store engine and the live-HTTP engine on the same
    inputs; per-run server attempt counters reset in between."""
    tmp_root, site, ppath, faults, srv = fixture

    synth = CrawlEngine(os.path.join(tmp_root, "synth"), batch_size=BATCH, n_partitions=8)
    synth.attach_store(ppath, faults)
    synth.init(site, None)
    synth.run(spark, max_batches=60)

    srv.counts.clear()
    live = CrawlEngine(os.path.join(tmp_root, "live"), batch_size=BATCH, n_partitions=8)
    live.attach_http_origin()
    live.init(site, None)
    live.run(spark, max_batches=60)
    return _state(spark, synth), _state(spark, live)


def test_live_trace_equals_synthetic(runs):
    assert runs[1][0] == runs[0][0]


def test_live_seen_equals_synthetic(runs):
    assert runs[1][1] == runs[0][1]


def test_live_failure_state_equals_synthetic(runs):
    assert runs[1][2] == runs[0][2]


def test_live_frontier_statuses_equal_synthetic(runs):
    assert runs[1][3] == runs[0][3]


def test_live_payloads_stored_and_revalidate(spark, fixture, runs):
    """Every live-fetched payload row re-decodes clean (audit 'ok')."""
    tmp_root, *_ = fixture
    live = CrawlEngine(os.path.join(tmp_root, "live"), batch_size=BATCH, n_partitions=8)
    audit = live.audit_payload(spark)
    cats = {r["category"]: r["count"] for r in audit.groupBy("category").count().collect()}
    assert set(cats) == {"ok"}
    assert cats["ok"] == len(runs[1][1])  # one stored payload per seen row


def test_live_crash_resume_over_real_sockets(spark, fixture, runs):
    """init → 2 batches → new engine process-equivalent (fresh instance,
    fresh origin attach) resumes from the checkpoint and finishes with the
    uninterrupted run's exact trace. Server counters are NOT reset at the
    resume boundary — attempt state must carry through the checkpoint just
    like the origin's real-world request history."""
    tmp_root, site, ppath, faults, srv = fixture
    srv.counts.clear()
    root = os.path.join(tmp_root, "live_resume")

    first = CrawlEngine(root, batch_size=BATCH, n_partitions=8)
    first.attach_http_origin()
    first.init(site, None)
    first.run(spark, max_batches=2)  # simulated crash: engine object dropped

    resumed = CrawlEngine(root, batch_size=BATCH, n_partitions=8)
    resumed.attach_http_origin()
    resumed.run(spark, max_batches=60)
    assert _state(spark, resumed) == runs[1]
