"""Multi-host DCN layer: window dispatch + spot aggregation over TCP."""

import time

import numpy as np

from cwsl_digi_tpu.constants import Mode
from cwsl_digi_tpu.modes.base import DecodeResult
from cwsl_digi_tpu.parallel.cluster import (
    SpotAggregator,
    SpotForwarder,
    WindowClient,
    WindowServer,
)
from cwsl_digi_tpu.report.spot import Spot
from cwsl_digi_tpu.runtime.decoderpool import DecodeJob, DecoderPool


class _FakeDecoder:
    def __init__(self, mode):
        self.mode = mode

    def decode(self, audio):
        return [[DecodeResult("CQ W2AXR FN13", -10, 0.0, 1500.0,
                              mode=self.mode)]
                for _ in range(audio.shape[0])]


def test_window_dispatch_end_to_end():
    got = []
    pool = DecoderPool(num_workers=1,
                       on_result=lambda j, ci, r: got.append((j.epoch_time, ci)),
                       decoder_factory=_FakeDecoder)
    pool.init()
    server = WindowServer(0, pool, host="127.0.0.1")
    try:
        client = WindowClient("127.0.0.1", server.port)
        rng = np.random.default_rng(0)
        job = DecodeJob(
            mode=Mode.FT8,
            audio=rng.standard_normal((3, 4000)).astype(np.float32),
            base_freqs=[14_074_000] * 3,
            decoder_indices=[0, 1, 2],
            epoch_time=1_700_000_000,
        )
        client.send(job)
        client.send(job)
        deadline = time.monotonic() + 5
        while len(got) < 6 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(got) == 6
        assert server.count_received == 2
        client.close()
    finally:
        server.close()
        pool.terminate()


def test_spot_aggregation_roundtrip():
    got = []
    agg = SpotAggregator(0, got.append, host="127.0.0.1")
    try:
        fwd = SpotForwarder("127.0.0.1", agg.port)
        s = Spot(callsign="W9XYZ", freq_hz=14_075_500,
                 base_freq_hz=14_074_000, snr_db=-12, dt_s=0.1,
                 mode=Mode.FT8, message="K1ABC W9XYZ -15", locator="EN34",
                 epoch_time=1_700_000_000, decoder_index=3)
        fwd.handle(s)
        deadline = time.monotonic() + 5
        while not got and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(got) == 1
        r = got[0]
        assert r.callsign == "W9XYZ" and r.mode == Mode.FT8
        assert r.freq_hz == 14_075_500 and r.decoder_index == 3
        fwd.terminate()
    finally:
        agg.close()
