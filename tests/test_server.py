"""Proof-service state machine + HTTP API vs reference semantics
(SURVEY.md §3.3: single prove at a time, single-slot pending queue,
coarse cooperative abort, status payload shapes)."""

import json
import os
import threading
import time
import urllib.request

import pytest

from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.server.fullprover import FullProver, Status, circuit_name

from conftest import FIXTURES

ZKEY = os.path.join(FIXTURES, "multiplier.zkey")


def _fake_witness_gen(delay: float = 0.0):
    """Stands in for the circom_runtime subprocess (fullprover.cpp:123):
    reads input.json {a, b}, writes the multiplier witness
    [1, a*b, a, b]."""
    from rapidsnark_tpu.io.wtns import write_wtns

    def gen(circuit, input_path, wtns_path):
        if delay:
            time.sleep(delay)
        with open(input_path) as f:
            inp = json.load(f)
        a, b = int(inp["a"]), int(inp["b"])
        write_wtns(wtns_path, [1, a * b % R_FR, a, b])

    return gen


def _wait_done(fp, timeout=900.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = fp.get_status()
        if st["status"] != "busy":
            return st
        time.sleep(0.05)
    raise TimeoutError("prover stayed busy")


def test_circuit_name():
    assert circuit_name("/x/y/circuit-400-32-256-64.zkey") == \
        "circuit-400-32-256-64"
    assert circuit_name("plain") == "plain"


def test_prove_success_and_status_shape(tmp_path):
    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=_fake_witness_gen())
    assert fp.get_status() == {"status": "ready"}
    fp.start_prove(json.dumps({"a": 3, "b": 5}), "multiplier")
    st = _wait_done(fp)
    assert st["status"] == "success"
    # reference encodes proof/pubData as JSON *strings* (fullprover.cpp:231)
    proof = json.loads(st["proof"])
    pub = json.loads(st["pubData"])
    assert pub == ["15"]
    assert proof["protocol"] == "groth16"

    # the proof must actually verify
    from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
    from rapidsnark_tpu.ref.groth16 import Proof, verify
    ref_zk = zkey_to_ref(read_zkey(ZKEY))
    p = Proof(a=(int(proof["pi_a"][0]), int(proof["pi_a"][1])),
              b=((int(proof["pi_b"][0][0]), int(proof["pi_b"][0][1])),
                 (int(proof["pi_b"][1][0]), int(proof["pi_b"][1][1]))),
              c=(int(proof["pi_c"][0]), int(proof["pi_c"][1])))
    assert verify(ref_zk, p, [15])


def test_failed_prove_reports_error(tmp_path):
    def bad_gen(circuit, input_path, wtns_path):
        raise RuntimeError("witness generator exploded")

    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=bad_gen)
    fp.start_prove("{}", "multiplier")
    st = _wait_done(fp)
    assert st["status"] == "failed"
    assert "exploded" in st["error"]


def test_pending_overwrite_and_abort(tmp_path):
    """A request during busy cancels the run and queues the new one
    (fullprover.cpp:72-77); the canceled run never emits a proof."""
    fp = FullProver([ZKEY], build_dir=str(tmp_path), window_bits=4,
                    witness_generator=_fake_witness_gen(delay=1.0))
    fp.start_prove(json.dumps({"a": 1, "b": 2}), "multiplier")
    time.sleep(0.2)  # let the worker enter the slow witness gen
    assert fp.get_status()["status"] == "busy"
    fp.start_prove(json.dumps({"a": 3, "b": 5}), "multiplier")
    st = _wait_done(fp)
    assert st["status"] == "success"
    assert json.loads(st["pubData"]) == ["15"]  # the SECOND request won


def test_abort_when_idle_is_noop(tmp_path):
    fp = FullProver([ZKEY], build_dir=str(tmp_path), window_bits=4,
                    witness_generator=_fake_witness_gen())
    fp.abort()
    assert fp.get_status() == {"status": "ready"}


def test_failed_prove_error_read_during_transition(tmp_path):
    """Concurrent get_status while a failing prove transitions: the
    error-path _err_string write happens under the lock (advisor /
    VERDICT weak #5) — readers never see a torn failed-without-error
    state and nothing deadlocks."""
    def bad_gen(circuit, input_path, wtns_path):
        time.sleep(0.2)
        raise RuntimeError("late explosion")

    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=bad_gen)
    seen, errs = [], []

    def poll():
        for _ in range(400):
            st = fp.get_status()
            seen.append(st["status"])
            if st["status"] == "failed":
                if "error" not in st or "explosion" not in st["error"]:
                    errs.append(st)
                return
            time.sleep(0.01)

    pollers = [threading.Thread(target=poll) for _ in range(4)]
    for t in pollers:
        t.start()
    fp.start_prove("{}", "multiplier")
    for t in pollers:
        t.join()
    assert not errs
    st = fp.get_status()
    assert st["status"] == "failed" and "explosion" in st["error"]


def _raw_http(host, port, payload: bytes) -> bytes:
    import socket

    with socket.create_connection((host, port), timeout=10) as s:
        s.sendall(payload)
        s.settimeout(10)
        out = b""
        while b"\r\n\r\n" not in out:
            chunk = s.recv(4096)
            if not chunk:
                break
            out += chunk
        return out


def test_http_chunked_body_works_and_cap_enforced(tmp_path):
    """Transfer-Encoding: chunked bodies are decoded and the 128 MB cap
    applies to them too (reference cap: main_proofserver.cpp:32; a
    Content-Length-only check would miss chunked framing entirely)."""
    from rapidsnark_tpu.server.http import make_server

    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=_fake_witness_gen())
    server = make_server(fp, 0, host="127.0.0.1")
    host, port = server.server_address[:2]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        body = json.dumps({"a": 3, "b": 7}).encode()
        half = len(body) // 2
        req = (b"POST /input/multiplier HTTP/1.1\r\n"
               b"Host: t\r\nTransfer-Encoding: chunked\r\n\r\n"
               + hex(half)[2:].encode() + b"\r\n" + body[:half] + b"\r\n"
               + hex(len(body) - half)[2:].encode() + b"\r\n"
               + body[half:] + b"\r\n0\r\n\r\n")
        resp = _raw_http(host, port, req)
        assert resp.startswith(b"HTTP/1.1 200")
        st = _wait_done(fp)
        assert st["status"] == "success"
        assert json.loads(st["pubData"]) == ["21"]

        # an over-cap chunk header is rejected before any data is read
        big = (b"POST /input/multiplier HTTP/1.1\r\n"
               b"Host: t\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"10000000\r\n")  # one 256 MB chunk claimed
        resp = _raw_http(host, port, big)
        assert resp.startswith(b"HTTP/1.1 413")
    finally:
        server.shutdown()


def test_status_during_initializing_and_deferred_start(tmp_path):
    """defer_load: /status answers {} while the registry loads (the
    reference's getStatus has no initializing branch, fullprover.cpp:
    216-240, and its listener isn't even up yet); a prove request that
    arrives during init stays pending and starts after load()."""
    fp = FullProver([ZKEY], build_dir=str(tmp_path), window_bits=4,
                    witness_generator=_fake_witness_gen(),
                    defer_load=True)
    assert fp.status == Status.initializing
    assert fp.get_status() == {}          # exact reference payload
    fp.start_prove(json.dumps({"a": 2, "b": 3}), "multiplier")
    time.sleep(0.1)
    assert fp.status == Status.initializing  # not started during init
    fp.load()
    st = _wait_done(fp)
    assert st["status"] == "success"
    assert json.loads(st["pubData"]) == ["6"]


def test_http_chunked_trailers_consumed(tmp_path):
    """A chunked body with trailer headers parses and the connection
    stays in sync for a follow-up request on the same socket."""
    import socket

    from rapidsnark_tpu.server.http import make_server

    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=_fake_witness_gen())
    server = make_server(fp, 0, host="127.0.0.1")
    host, port = server.server_address[:2]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        body = json.dumps({"a": 6, "b": 7}).encode()
        req = (b"POST /input/multiplier HTTP/1.1\r\n"
               b"Host: t\r\nTransfer-Encoding: chunked\r\n"
               b"Trailer: X-Checksum\r\n\r\n"
               + hex(len(body))[2:].encode() + b"\r\n" + body + b"\r\n"
               b"0\r\nX-Checksum: abc\r\nX-Other: d\r\n\r\n")
        with socket.create_connection((host, port), timeout=10) as s:
            s.sendall(req)
            s.settimeout(10)
            out = b""
            while b"\r\n\r\n" not in out:
                chunk = s.recv(4096)
                if not chunk:
                    break
                out += chunk
            assert out.startswith(b"HTTP/1.1 200")
            # same socket, second request: desyncs if trailers weren't
            # consumed (they'd be parsed as this request line)
            s.sendall(b"GET /status HTTP/1.1\r\nHost: t\r\n\r\n")
            out2 = b""
            while b"\r\n\r\n" not in out2:
                chunk = s.recv(4096)
                if not chunk:
                    break
                out2 += chunk
            assert out2.startswith(b"HTTP/1.1 200")
        st = _wait_done(fp)
        assert st["status"] == "success"
        assert json.loads(st["pubData"]) == ["42"]
    finally:
        server.shutdown()


def test_http_routes(tmp_path):
    from rapidsnark_tpu.server.http import make_server

    fp = FullProver([ZKEY], build_dir=str(tmp_path),
                    window_bits=4, witness_generator=_fake_witness_gen())
    server = make_server(fp, 0, host="127.0.0.1")
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return r.status, r.read()

        def post(path, body=b""):
            req = urllib.request.Request(base + path, data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, r.read()

        st, body = get("/status")
        assert st == 200 and json.loads(body) == {"status": "ready"}
        assert post("/start")[0] == 200        # stub routes
        assert post("/stop")[0] == 200
        assert post("/cancel")[0] == 200
        st, _ = post("/input/multiplier",
                     json.dumps({"a": 2, "b": 4}).encode())
        assert st == 200
        t0 = time.time()
        while time.time() - t0 < 900:
            st, body = get("/status")
            if json.loads(body)["status"] != "busy":
                break
            time.sleep(0.05)
        payload = json.loads(body)
        assert payload["status"] == "success"
        assert json.loads(payload["pubData"]) == ["8"]
        # unknown circuit -> 404
        with pytest.raises(urllib.error.HTTPError):
            post("/input/nonexistent", b"{}")
    finally:
        server.shutdown()
