"""Screen FT8 recall / busy-band decodes / latency vs candidate budget.

Usage: python tools/tune_topk.py [trials] [k1 k2 ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from cwsl_digi_tpu import jaxcache

jaxcache.enable()

import parity
from cwsl_digi_tpu.modes import ft8
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr


def recall_at(dec, snr, trials, seed=42):
    rng = np.random.default_rng(seed)
    wins, wants = [], []
    for _ in range(trials):
        clean, want = parity.make_trial("FT8", rng, *[
            parity.SWEEPS["FT8"][k] for k in ("f0", "dt")])
        wins.append(add_noise_at_snr(clean, float(snr), 12000, rng))
        wants.append(want)
    res = dec.decode(np.stack(wins))
    msgs = [[r.message for r in rs] for rs in res]
    return sum(w in m for w, m in zip(wants, msgs)) / trials


def busy(dec, batch=24, per_window=6, seed=5):
    rng = np.random.default_rng(seed)
    wlen = int(ft8.T_R * 12_000)
    noise_power = 0.5 / 2500.0 * (12_000 / 2.0)
    wins = np.empty((batch, wlen), np.float32)
    for w in range(batch):
        acc = rng.standard_normal(wlen) * np.sqrt(noise_power)
        slots = np.linspace(600, 2500, per_window) + rng.uniform(
            -40, 40, per_window)
        for f0 in slots:
            text = (f"{parity.random_call(rng)} {parity.random_call(rng)} "
                    f"{parity.random_grid(rng)}")
            snr = float(rng.uniform(-20, -5))
            acc += 10.0 ** (snr / 20.0) * ft8.synthesize(
                text, float(f0), start_s=float(rng.uniform(0.1, 1.0)))
        wins[w] = acc
    res = dec.decode(wins)
    return sum(len(r) for r in res) / batch


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ks = [int(x) for x in sys.argv[2:]] or [512, 320, 256]
    for k in ks:
        dec = ft8.FT8Decoder(top_k=k)
        b = dec.max_device_batch
        rng = np.random.default_rng(0)
        wlen = int(ft8.T_R * 12000)
        audio = rng.standard_normal((b, wlen)).astype(np.float32)
        for w in range(b):
            audio[w] += 0.5 * ft8.synthesize("K1ABC W9XYZ FN20", 800.0 + 3 * w)
        dec.decode(audio)
        t0 = time.perf_counter()
        for _ in range(3):
            dec.decode(audio)
        dt = (time.perf_counter() - t0) / 3 / b
        r18 = recall_at(dec, -18.0, trials)
        r21 = recall_at(dec, -21.0, trials)
        dpw = busy(dec)
        print(f"top_k={k:4d}: {dt*1e3:5.1f} ms/win  recall -18={r18:.3f} "
              f"-21={r21:.3f}  busy={dpw:.2f}/6", flush=True)


if __name__ == "__main__":
    main()
