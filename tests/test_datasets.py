"""Dataset acquisition subsystem (dasp_tpu/utils/datasets.py): resumable
fetch, verification, registry acquire — hermetic via a local HTTP server.

The reference's acquisition story is a bare wget loop
(/root/reference/examples/virtual_analog.py:376-385, README.md:86-93);
these tests pin the behaviors that upgrade it: Range resume, sha256
gating, atomic promotion, archive extraction, offline fallback.
"""

import hashlib
import io
import json
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dasp_tpu.utils import datasets


class _RangeHandler(BaseHTTPRequestHandler):
    """Serves self.server.files (path -> bytes) with Range support and an
    optional per-path 'drop after N bytes' fault injection."""

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        files = self.server.files
        key = self.path.lstrip("/")
        if key not in files:
            self.send_error(404)
            return
        body = files[key]
        start = 0
        rng = self.headers.get("Range")
        self.server.requests.append((key, rng))
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].split("-")[0])
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {start}-{len(body)-1}/{len(body)}")
        else:
            self.send_response(200)
        payload = body[start:]
        drop = self.server.drop_after.get(key)
        if drop is not None and len(payload) > drop:
            # advertise the full length but close early -> client must resume
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload[:drop])
            del self.server.drop_after[key]  # fail only once
            self.wfile.flush()
            self.connection.close()
            return
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    srv.files = {}
    srv.drop_after = {}
    srv.requests = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield srv
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _body(n=100_000, seed=7):
    import numpy as np
    return np.random.default_rng(seed).integers(0, 256, n, dtype="u1").tobytes()


def test_fetch_full_and_sha256(server, tmp_path):
    body = _body()
    server.files["a.bin"] = body
    dest = str(tmp_path / "a.bin")
    got = datasets.fetch(f"{server.base}/a.bin", dest,
                         sha256=hashlib.sha256(body).hexdigest(), size=len(body))
    assert got == dest
    assert open(dest, "rb").read() == body
    assert not os.path.exists(dest + ".partial")


def test_fetch_existing_valid_file_skips_network(server, tmp_path):
    body = _body(1000)
    dest = tmp_path / "a.bin"
    dest.write_bytes(body)
    datasets.fetch(f"{server.base}/a.bin", str(dest),
                   sha256=hashlib.sha256(body).hexdigest())
    assert server.requests == []  # no HTTP traffic at all


def test_fetch_resumes_partial_with_range(server, tmp_path):
    body = _body()
    server.files["a.bin"] = body
    dest = tmp_path / "a.bin"
    # simulate an interrupted transfer: 40000 bytes already on disk
    (tmp_path / "a.bin.partial").write_bytes(body[:40_000])
    datasets.fetch(f"{server.base}/a.bin", str(dest),
                   sha256=hashlib.sha256(body).hexdigest())
    assert dest.read_bytes() == body
    # the server must have seen a Range request starting at the partial size
    assert ("a.bin", "bytes=40000-") in server.requests


def test_fetch_survives_midstream_drop(server, tmp_path):
    body = _body()
    server.files["a.bin"] = body
    server.drop_after["a.bin"] = 30_000  # connection dies after 30 kB once
    dest = tmp_path / "a.bin"
    datasets.fetch(f"{server.base}/a.bin", str(dest), retries=3, backoff=0.0,
                   sha256=hashlib.sha256(body).hexdigest())
    assert dest.read_bytes() == body
    # second request resumed rather than restarting from zero
    ranged = [r for (k, r) in server.requests if k == "a.bin" and r]
    assert ranged and ranged[0].startswith("bytes=")


def test_fetch_checksum_mismatch_raises(server, tmp_path):
    server.files["a.bin"] = b"not the expected content"
    with pytest.raises(datasets.DownloadError, match="sha256|failed"):
        datasets.fetch(f"{server.base}/a.bin", str(tmp_path / "a.bin"),
                       retries=2, backoff=0.0, sha256="0" * 64)
    # the corrupt partial must not be promoted
    assert not (tmp_path / "a.bin").exists()


def test_fetch_missing_url_raises_with_manual_hint(server, tmp_path):
    with pytest.raises(datasets.DownloadError, match="manually"):
        datasets.fetch(f"{server.base}/nope.bin", str(tmp_path / "n.bin"),
                       retries=2, backoff=0.0)


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_extract_zip(tmp_path):
    arc = tmp_path / "x.zip"
    arc.write_bytes(_zip_bytes({"audio/a.wav": b"AA", "audio/sub/b.wav": b"BB"}))
    out = datasets.extract_zip(str(arc), str(tmp_path / "data"))
    assert sorted(os.path.basename(p) for p in out) == ["a.wav", "b.wav"]
    assert (tmp_path / "data/audio/sub/b.wav").read_bytes() == b"BB"


def test_extract_zip_rejects_escape(tmp_path):
    arc = tmp_path / "evil.zip"
    arc.write_bytes(_zip_bytes({"../evil.txt": b"X"}))
    with pytest.raises(datasets.DownloadError, match="unsafe"):
        datasets.extract_zip(str(arc), str(tmp_path / "data"))


def test_acquire_registry_subset_and_manifest(server, tmp_path, monkeypatch):
    bodies = {f: _body(5_000 + i, seed=i) for i, (f, _u) in
              enumerate(datasets.DATASETS["idmt-amps"].files[:3])}
    server.files.update(bodies)
    root = str(tmp_path / "amps")
    paths = datasets.acquire("idmt-amps", root, files=list(bodies),
                             base_url=server.base)
    assert [os.path.basename(p) for p in paths] == list(bodies)
    for p, body in zip(paths, bodies.values()):
        assert open(p, "rb").read() == body
    man = json.load(open(os.path.join(root, ".dasp_manifest.json")))
    assert set(man) == set(bodies)
    # second acquire is a no-op on the network
    server.requests.clear()
    datasets.acquire("idmt-amps", root, files=list(bodies), base_url=server.base)
    assert server.requests == []


def test_acquire_unknown_file_raises():
    with pytest.raises(KeyError, match="unknown files"):
        datasets.acquire("idmt-amps", "/tmp/x", files=["nope.wav"], offline=True)


def test_acquire_offline_missing_raises(tmp_path):
    with pytest.raises(datasets.DownloadError, match="offline"):
        datasets.acquire("idmt-amps", str(tmp_path),
                         files=["idmt-rock-input-varying-gain.wav"], offline=True)


def test_acquire_offline_present_ok(tmp_path):
    rel = "idmt-rock-input-varying-gain.wav"
    (tmp_path / rel).write_bytes(b"RIFFdata")
    out = datasets.acquire("idmt-amps", str(tmp_path), files=[rel], offline=True)
    assert out == [str(tmp_path / rel)]


def test_acquire_extracts_archives(server, tmp_path):
    zbody = _zip_bytes({"audio_mono-mic/00_BN1.wav": b"WAV"})
    server.files["audio_mono-mic.zip"] = zbody
    root = str(tmp_path / "gs")
    datasets.acquire("guitarset-mono-mic", root, base_url=server.base)
    assert (tmp_path / "gs/audio_mono-mic/00_BN1.wav").read_bytes() == b"WAV"


def test_verify_reports_and_caches(tmp_path):
    rel = "idmt-rock-input-varying-gain.wav"
    status = datasets.verify("idmt-amps", str(tmp_path))
    assert status[rel] is False
    (tmp_path / rel).write_bytes(b"RIFF")
    status = datasets.verify("idmt-amps", str(tmp_path))
    assert status[rel] is True  # no pinned hash -> presence is enough


def test_cli_verify_and_fetch(server, tmp_path, capsys):
    body = _body(2_000)
    server.files["idmt-rock-input-varying-gain.wav"] = body
    rc = datasets._cli(["idmt-amps", "--root", str(tmp_path), "--verify"])
    assert rc == 1  # nothing present yet
    (tmp_path / "idmt-rock-input-varying-gain.wav").write_bytes(body)
    rc = datasets._cli(["idmt-amps", "--root", str(tmp_path), "--verify"])
    out = capsys.readouterr().out
    assert "idmt-rock-input-varying-gain.wav" in out
    assert rc == 1  # the other six are still missing
