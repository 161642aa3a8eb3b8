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


def _recall_curve(snrs=(-18.0, -19.0, -20.0, -21.0, -22.0),
                  trials: int = 100) -> dict:
    """FT8 recall vs SNR with >=100-trial statistics + 50%-threshold.

    The round-3 bench recorded two points at 32 trials (+-9% binomial
    noise); the full curve with 100 trials pins threshold_db to ~+-0.2 dB
    (VERDICT r3 'what's weak' #1)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity

    r = parity.sweep_mode("FT8", trials, snrs=list(snrs), verbose=False)
    return {"recall": r["recall"], "trials": trials,
            "threshold_db": r["threshold_db"]}


# Reference channel-mix template: the shipped config.ini demonstrates 72
# decoder lines across 14 bands (reference config.ini:45-145); the mixed-
# mode capacity below uses exactly that distribution.
TEMPLATE_MIX = {
    "FT8": 18, "WSPR": 11, "FT4": 10, "JT65": 9, "JS8": 6,
    "FST4W-120": 3, "FST4-60": 3, "FST4-120": 3, "FST4W-300": 2,
    "FST4-300": 2, "Q65-30": 1, "FST4W-900": 1, "FST4W-1800": 1,
    "FST4-900": 1, "FST4-1800": 1,
}

# modes whose decode cost is measured directly in the bench; the long
# FST4 periods are modeled from FST4-120 by window-sample ratio
# (spectrogram-dominated cost, linear in samples) and labeled as such
MEASURED_MODES = ("FT4", "JS8", "WSPR", "JT65", "Q65-30",
                  "FST4-60", "FST4-120", "FST4W-120")


def _bench_mode_decode(mode: str, batch: int = 8, snr_db: float = -10.0,
                       reps: int = 2) -> float:
    """Steady-state decode() wall seconds per window for one mode.

    Windows carry one protocol-exact signal + noise (the q-ary modes run
    their host-side RS/QRA stage only when sync candidates exist, so
    pure-noise timing would flatter them — VERDICT r3 'what's weak' #5)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity

    from cwsl_digi_tpu.modes.base import get_decoder
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    rng = np.random.default_rng(11)
    cfg = parity.SWEEPS[mode]
    dec = get_decoder(mode)
    batches = []
    for _ in range(reps + 1):
        wins = [add_noise_at_snr(
            parity.make_trial(mode, rng, cfg["f0"], cfg["dt"])[0],
            snr_db, 12_000, rng) for _ in range(batch)]
        batches.append(np.stack(wins))
    dec.decode(batches[0])                                # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        dec.decode(batches[1 + i])
    return (time.perf_counter() - t0) / reps / batch


def _bench_qary_host_fraction(mode: str, batch: int = 8) -> float:
    """Host-side share of a q-ary mode's decode wall time.

    JT65/Q65 run their RS/QRA FEC on the host (native/rs_ft.cpp +
    modes/qary_engine.py); at high channel counts the host could become
    the bottleneck, so the bench records what fraction of the decode is
    host work (total decode() minus the device decode_arrays part)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity

    from cwsl_digi_tpu.modes.base import get_decoder
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    rng = np.random.default_rng(13)
    cfg = parity.SWEEPS[mode]
    dec = get_decoder(mode)
    wins = np.stack([add_noise_at_snr(
        parity.make_trial(mode, rng, cfg["f0"], cfg["dt"])[0],
        -10.0, 12_000, rng) for _ in range(batch)])
    dec.decode(wins)                                      # compile + warm
    t0 = time.perf_counter()
    dec.decode_arrays(wins)
    dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    dec.decode(wins)
    tot = time.perf_counter() - t0
    return max(0.0, round(1.0 - dev / max(tot, 1e-9), 3))


def _mixed_mode_channels(t_chan: float, s_per_window: dict) -> int:
    """Real-time channels/chip for the reference's template mix.

    A mode-m channel consumes ``t_chan`` device-seconds per second of
    audio plus ``C_m / T_m`` decode-seconds per second; capacity is the
    N at which the weighted mix saturates one chip-second per second."""
    from cwsl_digi_tpu.constants import Mode, get_rx_period

    total_lines = sum(TEMPLATE_MIX.values())
    rate = 0.0
    for mode, n_lines in TEMPLATE_MIX.items():
        cost = s_per_window.get(mode)
        if cost is None:                      # modeled long FST4 period
            period = float(mode.split("-")[-1])
            cost = s_per_window["FST4-120"] * period / 120.0
        t_r = get_rx_period(Mode(mode))
        rate += (n_lines / total_lines) * (cost / t_r + t_chan)
    return int(1.0 / rate)


def _parity_summary() -> dict | None:
    """Per-mode threshold_db from the committed PARITY_REPORT.json, with
    deltas vs the practical WSJT-X limits quoted in tools/parity.py."""
    path = os.path.join(REPO, "PARITY_REPORT.json")
    if not os.path.exists(path):
        return None
    # practical WSJT-X limits as quoted in tools/parity.py; the FST4W-120
    # figure is the least certain recall (FST4-120 shares its waveform and
    # is usually quoted ~5 dB higher)
    targets = {"FT8": -21.0, "FT4": -17.5, "WSPR": -31.0, "JT65": -24.0,
               "Q65-30": -26.0, "FST4-60": -24.5, "FST4W-120": -32.0}
    with open(path) as f:
        rep = json.load(f)
    out = {}
    for mode, r in rep.get("modes", {}).items():
        t = r.get("threshold_db")
        tgt = targets.get(mode)
        out[mode] = {
            "threshold_db": t,
            "wsjtx_target_db": tgt,
            "delta_db": (None if t is None or tgt is None
                         else round(t - tgt, 1)),
        }
    return out


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
    curve = _recall_curve()
    s_per_window = {"FT8": t_dec}
    for mode in MEASURED_MODES:
        s_per_window[mode] = round(_bench_mode_decode(mode), 5)
    mixed = _mixed_mode_channels(t_chan[best_chan], s_per_window)
    host_frac = {m: _bench_qary_host_fraction(m) for m in ("JT65", "Q65-30")}
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
            "ft8_recall_curve": curve["recall"],
            "ft8_recall_trials": curve["trials"],
            "ft8_threshold_db": curve["threshold_db"],
            "mode_decode_s_per_window": s_per_window,
            # template mix = the reference's shipped 72-line config
            # (config.ini:45-145); long FST4 costs modeled from FST4-120
            # by sample ratio
            "mixed_mode_channels_per_chip": mixed,
            "qary_host_fraction": host_frac,
            "parity_thresholds": _parity_summary(),
            "skim_scaling_cpu_8dev": scaling,
        },
    }))


if __name__ == "__main__":
    main()
