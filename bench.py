"""Headline benchmark: simultaneous real-time FT8 channels per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The baseline is the driver's north-star target of 500 simultaneous
FT8-equivalent channels per TPU v5e host in real time (BASELINE.md);
the reference itself publishes no numbers (its implicit capacity is ~60
channels on one PC, config.ini:45-145).

What is measured (the PRODUCTION path, not a single program call):

  - channelizer: steady-state device time per channel-second at a real SDR
    rate (192 kHz, 256 channels), for BOTH backends (XLA batched polyphase
    and the Pallas fused kernel); the faster one is what the headline uses.
    The runtime runs XLA only — the Pallas kernel lost every bench-off and
    is demoted to a measured experiment (dsp/pallas_channelizer.py).
  - decode: wall time of ``FT8Decoder.decode()`` — sync + depth subtraction
    passes + OSD + host unpack — on a realistic busy-band window mix
    (6 signals/window at −5..−20 dB), amortized over a 24-window batch.
  - recall: FT8 recall at −18 and −21 dB on randomized protocol-exact
    signals (the parity harness's sweep, tools/parity.py), so the decode
    *capability* is captured in the artifact next to the throughput.
  - scaling: channel-sharded skim step on an 8-virtual-device CPU mesh vs
    1 device (subprocess; sanity artifact for the pjit path, not a perf
    claim — ICI scaling needs real chips).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def _bench_channelizer(backend: str, n_ch: int = 256, fs: int = 192_000):
    import jax

    if backend == "pallas":
        from cwsl_digi_tpu.dsp.pallas_channelizer import PallasChannelizer as C
    else:
        from cwsl_digi_tpu.dsp.channelizer import BatchChannelizer as C

    rng = np.random.default_rng(0)
    bc = C(fs, np.linspace(-fs / 2 + 8000, fs / 2 - 8000, n_ch))
    gran = getattr(bc, "_sub", None) or bc.tile_t
    n = int(fs * 1.0)
    n -= n % gran
    iq_re = rng.standard_normal(n).astype(np.float32)
    iq_im = rng.standard_normal(n).astype(np.float32)
    jax.block_until_ready(bc.process((iq_re, iq_im)))    # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(bc.process((iq_re, iq_im)))
    dt = (time.perf_counter() - t0) / reps
    return dt / (n / fs) / n_ch  # device seconds per channel-second


def _make_busy_windows(batch: int = 24, per_window: int = 6, seed: int = 5,
                       ):
    """Realistic production mix: multiple signals per window + noise."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from parity import random_call, random_grid

    from cwsl_digi_tpu.modes import ft8

    rng = np.random.default_rng(seed)
    wlen = int(ft8.T_R * 12_000)
    noise_power = 0.5 / 2500.0 * (12_000 / 2.0)
    wins = np.empty((batch, wlen), np.float32)
    for w in range(batch):
        acc = rng.standard_normal(wlen) * np.sqrt(noise_power)
        slots = np.linspace(600, 2500, per_window) + rng.uniform(
            -40, 40, per_window)
        for f0 in slots:
            text = f"{random_call(rng)} {random_call(rng)} {random_grid(rng)}"
            snr = float(rng.uniform(-20, -5))
            acc += 10.0 ** (snr / 20.0) * ft8.synthesize(
                text, float(f0), start_s=float(rng.uniform(0.1, 1.0)))
        wins[w] = acc
    return wins


def _bench_decode_production(batch: int | None = None):
    """Wall time per window of the full decode() path on a busy band.

    Batch defaults to the decoder's full device chunk — the operating
    point of a loaded skimmer (hundreds of channels -> full batches)."""
    from cwsl_digi_tpu.modes import ft8

    dec = ft8.FT8Decoder()
    batch = batch or dec.max_device_batch
    # FRESH windows per rep: re-sending one buffer lets transport-level
    # caching flatter the upload cost; production never repeats a window
    reps = 3
    batches = [_make_busy_windows(batch, seed=5 + i)
               for i in range(reps + 1)]
    res = dec.decode(batches[0])                          # compile + warm
    n_decoded = sum(len(r) for r in res)
    t0 = time.perf_counter()
    for i in range(reps):
        dec.decode(batches[1 + i])
    dt = (time.perf_counter() - t0) / reps
    return dt / batch, n_decoded / batch


def _recall(snr_db: float, trials: int = 32) -> float:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity

    r = parity.sweep_mode("FT8", trials, snrs=[snr_db], verbose=False)
    return r["recall"][f"{snr_db:.1f}"]


def _bench_scaling_cpu8() -> dict | None:
    """Sharded-skim partition quality on an 8-virtual-device CPU mesh.

    Two numbers:
    - ``partition_flops_ratio``: per-device compiled FLOPs at 1 device /
      at 8 devices.  8.0 = the skim program partitions perfectly over the
      channel axis (the shard_map path guarantees this structurally; a
      GSPMD regression would show up here immediately).  This is the
      machine-independent scaling signal — ICI wall-clock scaling needs
      real chips.
    - ``wall_speedup``: measured wall ratio, which on a CPU mesh is
      bounded by PHYSICAL CORES, not devices (a 1-device XLA CPU run
      already multithreads across all cores; this host has os.cpu_count()
      of them).  Reported for honesty, not as the scaling claim.
    """
    code = r"""
import json, os, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh
import cwsl_digi_tpu.parallel.pipeline as pl
from cwsl_digi_tpu.modes import ft8

fs = 192_000
rng = np.random.default_rng(0)
iq = (rng.standard_normal(fs * 15) + 1j * rng.standard_normal(fs * 15)
      ).astype(np.complex64)
dec = ft8.FT8Decoder(top_k=8, bp_iters=12)

orig = pl._skim_program
captured = {}
def spy(*args):
    captured["args"] = args
    return orig(*args)
pl._skim_program = spy

out = {}
for nd in (1, 8):
    devs = np.array(jax.devices()[:nd])
    freqs = np.linspace(-80_000, 80_000, 32)
    step = pl.ShardedSkimStep(fs, freqs, Mesh(devs, ("ch",)), decoder=dec)
    step.step(iq)   # compile
    t0 = time.perf_counter()
    step.step(iq)
    ca = orig.lower(*captured["args"]).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out[nd] = {"wall": time.perf_counter() - t0, "flops": ca.get("flops", 0)}
out["cores"] = os.cpu_count()
print(json.dumps(out))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    try:
        p = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=900)
        t = json.loads(p.stdout.strip().splitlines()[-1])
        return {
            "partition_flops_ratio": round(
                t["1"]["flops"] / max(t["8"]["flops"], 1.0), 2),
            "wall_speedup": round(t["1"]["wall"] / t["8"]["wall"], 2),
            "host_cores": t["cores"],
        }
    except Exception:
        return None


def main() -> None:
    from cwsl_digi_tpu import jaxcache

    jaxcache.enable()
    from cwsl_digi_tpu.modes import ft8

    t_chan = {b: _bench_channelizer(b) for b in ("xla", "pallas")}
    best_chan = min(t_chan, key=t_chan.get)
    t_dec, decodes_per_win = _bench_decode_production()
    recall_18 = _recall(-18.0)
    recall_21 = _recall(-21.0)
    scaling = _bench_scaling_cpu8()

    # per-channel budget each T/R period: channelize 15 s + decode 1 window
    cost_per_period = t_chan[best_chan] * ft8.T_R + t_dec
    channels = int(ft8.T_R / cost_per_period)
    baseline = 500.0                        # north-star channels/host
    print(json.dumps({
        "metric": "ft8_realtime_channels_per_chip",
        "value": channels,
        "unit": "channels",
        "vs_baseline": round(channels / baseline, 3),
        "detail": {
            "channelizer_s_per_channel_second_xla": round(t_chan["xla"], 8),
            "channelizer_s_per_channel_second_pallas": round(
                t_chan["pallas"], 8),
            "channelizer_backend": best_chan,
            "decode_s_per_window_production": round(t_dec, 5),
            "decodes_per_window": round(decodes_per_win, 2),
            "ft8_recall_-18dB": recall_18,
            "ft8_recall_-21dB": recall_21,
            "skim_scaling_cpu_8dev": scaling,
        },
    }))


if __name__ == "__main__":
    main()
