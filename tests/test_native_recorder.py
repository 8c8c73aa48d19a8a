"""Native C++ recorder data plane: file round-trips, Python interop,
threaded-flush semantics, TCP loopback (the reference's recorder test
strategy incl. network loopback, core/recorders/unit_test_recorders.cpp)."""
import os
import socket
import threading

import numpy as np
import pytest

from reak_tpu.io import native_recorder as nr

pytestmark = pytest.mark.skipif(not nr.available(),
                                reason="no native toolchain")


def test_binary_roundtrip(tmp_path, rng):
    path = str(tmp_path / "rows.bin")
    rows = rng.standard_normal((100, 4))
    with nr.NativeRecorder(path, ["t", "x", "y", "z"]) as rec:
        rec.record_rows(rows)
        rec.flush()
    with nr.NativeExtractor(path) as ext:
        assert ext.columns == ["t", "x", "y", "z"]
        got = ext.read_all()
    np.testing.assert_allclose(got, rows, atol=0)


def test_csv_roundtrip(tmp_path):
    path = str(tmp_path / "rows.csv")
    with nr.NativeRecorder(path, ["a", "b"]) as rec:
        rec.record([1.5, -2.25])
        rec.record({"a": 3.0, "b": 4.0})
    with nr.NativeExtractor(path) as ext:
        got = ext.read_all()
    np.testing.assert_allclose(got, [[1.5, -2.25], [3.0, 4.0]])


def test_python_extractor_reads_native_binary(tmp_path, rng):
    """Wire-format interop with the pure-Python recorder layer."""
    from reak_tpu.io.recorder import open_extractor
    path = str(tmp_path / "interop.bin")
    rows = rng.standard_normal((10, 3))
    with nr.NativeRecorder(path, ["u", "v", "w"]) as rec:
        rec.record_rows(rows)
    cols, got = open_extractor(path)
    assert list(cols) == ["u", "v", "w"]
    np.testing.assert_allclose(np.asarray(got), rows)


def test_row_width_mismatch_raises(tmp_path):
    with nr.NativeRecorder(str(tmp_path / "x.bin"), ["a", "b"]) as rec:
        with pytest.raises(ValueError):
            rec.record([1.0, 2.0, 3.0])


def test_tcp_loopback(tmp_path, rng):
    """Native TCP recorder → Python socket server (loopback within one
    process, like unit_test_recorders.cpp network tests)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = bytearray()
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.settimeout(10.0)
        try:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                received.extend(chunk)
        except socket.timeout:
            pass
        conn.close()
        done.set()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    rows = rng.standard_normal((50, 2))
    rec = nr.NativeRecorder(f"tcp://127.0.0.1:{port}", ["p", "q"])
    rec.record_rows(rows)
    rec.flush()
    rec.close()
    done.wait(timeout=10.0)
    srv.close()

    header, _, body = bytes(received).partition(b"\n")
    assert b'"columns"' in header and b'"p"' in header
    got = np.frombuffer(body, np.float64).reshape(-1, 2)
    np.testing.assert_allclose(got, rows)


def test_throughput_smoke(tmp_path, rng):
    """Background-thread buffering should sustain >100k rows/s to file."""
    import time
    path = str(tmp_path / "perf.bin")
    rows = rng.standard_normal((20000, 8))
    rec = nr.NativeRecorder(path, [f"c{i}" for i in range(8)])
    t0 = time.perf_counter()
    rec.record_rows(rows)
    rec.flush()
    dt = time.perf_counter() - t0
    rec.close()
    assert rows.shape[0] / dt > 1e5, f"only {rows.shape[0]/dt:.0f} rows/s"
