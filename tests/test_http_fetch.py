"""Live HTTP fetch path (S7, reference file_downloader.py:331-528) driven
against a localhost origin: chunked streaming, Range resume, 404s, stall
timeout, and wave-ordered politeness sleeps — no outbound network."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from web_scraper_spark.sources.store import http_fetch_rows


def _body_for(item: int) -> bytes:
    return bytes((item * 7 + i) % 256 for i in range(1500))


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path.startswith("/item/"):
            body = _body_for(int(self.path.rsplit("/", 1)[1]))
            rng = self.headers.get("Range")
            if rng and self.server.honor_range:
                start = int(rng.split("=")[1].rstrip("-"))
                self.send_response(206)
                chunk = body[start:]
            else:
                self.send_response(200)
                chunk = body
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
        elif self.path == "/stall":
            time.sleep(3)
            self.send_response(200)
            self.end_headers()
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def origin():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.honor_range = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _base(origin):
    return f"http://127.0.0.1:{origin.server_address[1]}"


def test_fetch_bodies_and_404(origin):
    pdf = pd.DataFrame(
        {
            "url": [f"{_base(origin)}/item/{i}" for i in range(4)]
            + [f"{_base(origin)}/nope"],
            "fetch_wave": [0, 0, 1, 1, 2],
            "crawl_delay_ms": [0] * 5,
        }
    )
    out = http_fetch_rows(pdf, timeout_s=5)
    assert list(out["url"]) == list(pdf["url"])
    for i in range(4):
        assert out["body"].iloc[i] == _body_for(i)
        assert out["status_code"].iloc[i] == 200
        assert out["error"].iloc[i] is None
    assert out["body"].iloc[4] is None
    assert out["status_code"].iloc[4] == 404
    assert out["error"].iloc[4] == "HTTP 404"


def test_range_resume_completes_partial(origin):
    url = f"{_base(origin)}/item/9"
    full = _body_for(9)
    partial = full[:700]
    pdf = pd.DataFrame({"url": [url], "fetch_wave": [0], "crawl_delay_ms": [0]})
    out = http_fetch_rows(pdf, timeout_s=5, resume_from={url: partial})
    assert out["status_code"].iloc[0] == 206
    assert out["body"].iloc[0] == full  # prior partial + ranged remainder


def test_range_fallback_when_origin_ignores_header(origin):
    origin.honor_range = False
    try:
        url = f"{_base(origin)}/item/3"
        pdf = pd.DataFrame({"url": [url], "fetch_wave": [0], "crawl_delay_ms": [0]})
        out = http_fetch_rows(pdf, timeout_s=5, resume_from={url: b"xx"})
        # origin sent 200 + full body -> the stale partial must NOT be kept
        assert out["status_code"].iloc[0] == 200
        assert out["body"].iloc[0] == _body_for(3)
    finally:
        origin.honor_range = True


def test_stalled_transfer_times_out_not_wedges(origin):
    pdf = pd.DataFrame(
        {"url": [f"{_base(origin)}/stall"], "fetch_wave": [0], "crawl_delay_ms": [0]}
    )
    t0 = time.time()
    out = http_fetch_rows(pdf, timeout_s=0.4)
    assert time.time() - t0 < 2.5  # bounded, did not wait out the stall
    assert out["body"].iloc[0] is None
    assert "Timeout" in out["error"].iloc[0]


def test_wave_ordered_sleeps(origin):
    slept = []
    pdf = pd.DataFrame(
        {
            "url": [f"{_base(origin)}/item/{i}" for i in range(6)],
            "fetch_wave": [0, 0, 1, 1, 2, 2],
            "crawl_delay_ms": [100, 200, 150, 150, 0, 0],
        }
    )
    out = http_fetch_rows(pdf, timeout_s=5, sleep=slept.append)
    # one sleep per wave boundary, sized by the finished wave's max delay
    assert slept == [0.2, 0.15]
    assert all(b is not None for b in out["body"])


def test_max_body_bytes_aborts_oversized(origin):
    pdf = pd.DataFrame(
        {"url": [f"{_base(origin)}/item/1"], "fetch_wave": [0], "crawl_delay_ms": [0]}
    )
    out = http_fetch_rows(pdf, timeout_s=5, max_body_bytes=500)
    assert out["body"].iloc[0] is None
    assert out["error"].iloc[0] == "body exceeds max_body_bytes"
