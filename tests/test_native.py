"""Native C++ components: ring buffer, shm reader, intake pump."""

import time

import numpy as np
import pytest

pytest.importorskip("ctypes")

from cwsl_digi_tpu.sdr.shm import ShmWriter

try:
    from cwsl_digi_tpu.native import (
        NativePump,
        NativeRing,
        NativeShmSource,
        NativeUnavailable,
        load,
    )

    load()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - environment without g++
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def test_native_ring_spmc():
    ring = NativeRing(block_bytes=1024 * 8, n_blocks=4)
    r0 = ring.add_reader()
    r1 = ring.add_reader()
    blocks = [np.full(1024, i, np.complex64) for i in range(3)]
    for b in blocks:
        assert ring.push(b)
    for i in range(3):
        np.testing.assert_array_equal(ring.pop(r0, 0.2), blocks[i])
    assert ring.pop(r0, 0.05) is None          # drained for reader 0
    assert ring.pending(r1) == 3               # reader 1 independent
    np.testing.assert_array_equal(ring.pop(r1, 0.2), blocks[0])
    ring.close()


def test_native_ring_backpressure():
    ring = NativeRing(block_bytes=64, n_blocks=2)
    r = ring.add_reader()
    a = np.zeros(8, np.complex64)
    assert ring.push(a, timeout=0.1)
    assert ring.push(a, timeout=0.1)
    t0 = time.monotonic()
    assert not ring.push(a, timeout=0.15)      # full: producer stalls
    assert time.monotonic() - t0 >= 0.14
    ring.pop(r, 0.1)
    assert ring.push(a, timeout=0.1)           # space freed
    ring.close()


def test_native_shm_source_reads_python_writer():
    """The C++ reader interoperates with the Python ShmWriter layout."""
    w = ShmWriter("natshm0", sample_rate=96_000, block_in_samples=512,
                  l0=14_085_000, num_blocks=8)
    try:
        src = NativeShmSource("natshm0")
        assert src.sample_rate == 96_000
        assert src.block_size == 512
        assert src.lo_freq == 14_085_000
        blocks = [np.full(512, i + 1j, np.complex64) for i in range(4)]
        for b in blocks:
            w.write_block(b)
        for i in range(4):
            np.testing.assert_array_equal(src.read_block(0.5), blocks[i])
        assert src.read_block(0.05) is None
        src.close()
    finally:
        w.close()


def test_native_pump_end_to_end():
    """shm -> native pump thread -> ring -> python consumer."""
    w = ShmWriter("natshm1", 48_000, 256, 7_000_000, num_blocks=16)
    try:
        src = NativeShmSource("natshm1")
        ring = NativeRing(block_bytes=256 * 8, n_blocks=32)
        reader = ring.add_reader()
        pump = NativePump(src, ring)
        for i in range(10):
            w.write_block(np.full(256, float(i), np.complex64))
        deadline = time.monotonic() + 5
        while pump.blocks < 10 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert pump.blocks == 10 and pump.dropped == 0
        got = [ring.pop(reader, 0.5) for _ in range(10)]
        assert all(g is not None for g in got)
        np.testing.assert_array_equal(got[3], np.full(256, 3.0, np.complex64))
        pump.stop()
        ring.close()
        src.close()
    finally:
        w.close()
