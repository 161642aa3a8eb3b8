"""Headline benchmark: simultaneous real-time FT8 channels per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline is the driver's north-star target of 500 simultaneous
FT8-equivalent channels per TPU v5e host in real time (BASELINE.md);
the reference itself publishes no numbers (its implicit capacity is ~60
channels on one PC, config.ini:45-145).

Method: measure steady-state device time for (a) the batched channelizer at
a realistic SDR rate and (b) the batched FT8 decode program, then compute
how many channels fit in one T/R period:  per-channel cost per 15 s =
channelizer time per channel + decode time per window.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_channelizer(n_ch: int = 256, fs: int = 192_000, secs: float = 1.0):
    import jax

    from cwsl_digi_tpu.dsp.channelizer import BatchChannelizer

    rng = np.random.default_rng(0)
    bc = BatchChannelizer(fs, np.linspace(-fs / 2 + 8000, fs / 2 - 8000, n_ch))
    n = int(fs * secs)
    n -= n % bc._sub
    iq_re = rng.standard_normal(n).astype(np.float32)
    iq_im = rng.standard_normal(n).astype(np.float32)
    # warmup/compile
    jax.block_until_ready(bc.process((iq_re, iq_im)))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(bc.process((iq_re, iq_im)))
    dt = (time.perf_counter() - t0) / reps
    audio_secs = n / fs
    return dt / audio_secs / n_ch  # device seconds per channel-second


def _bench_decode(batch: int = 32, top_k: int | None = None,
                  iters: int | None = None):
    import jax

    from cwsl_digi_tpu.modes import ft8

    from cwsl_digi_tpu.constants import WAVE_SR
    from cwsl_digi_tpu.modes.gfsk_engine import decode_program

    dec = ft8.FT8Decoder(top_k=top_k, bp_iters=iters)
    rng = np.random.default_rng(1)
    wins = rng.standard_normal((batch, int(ft8.T_R * WAVE_SR))).astype(np.float32)
    args = (dec.spec, (wins.shape[1],), np.asarray(wins),
            dec._crc_mat, dec._bitmaps, dec._window, dec.bp, dec._data_syms)
    jax.block_until_ready(decode_program(*args))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(decode_program(*args))
    dt = (time.perf_counter() - t0) / reps
    return dt / batch  # device seconds per 15 s window


def main() -> None:
    from cwsl_digi_tpu import jaxcache

    jaxcache.enable()
    from cwsl_digi_tpu.modes import ft8

    t_chan = _bench_channelizer()          # s per channel-second
    t_dec = _bench_decode()                # s per window
    # per-channel budget each T/R period
    cost_per_period = t_chan * ft8.T_R + t_dec
    channels = int(ft8.T_R / cost_per_period)
    baseline = 500.0                        # north-star channels/host
    print(json.dumps({
        "metric": "ft8_realtime_channels_per_chip",
        "value": channels,
        "unit": "channels",
        "vs_baseline": round(channels / baseline, 3),
        "detail": {
            "channelizer_s_per_channel_second": round(t_chan, 8),
            "decode_s_per_window": round(t_dec, 5),
        },
    }))


if __name__ == "__main__":
    main()
