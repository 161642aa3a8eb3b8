"""Per-mode sensitivity sweep: decode probability vs SNR (2500 Hz ref bw).

Reference decoder-chain thresholds to match (WSJT-X/wsprd practical limits):
FT8 ~ -21 dB, FT4 ~ -17.5, WSPR ~ -28..-31, JT65 ~ -24, Q65-30 ~ -27,
FST4-60 ~ -24.5, FST4W-120 ~ -32 (approx, depth-dependent).

Usage: python tools/sensitivity.py [mode ...] [--trials N] [--snrs a,b,c]
Runs on whatever JAX platform is ambient (use JAX_PLATFORMS=cpu for CPU).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sweep(mode: str, snrs, trials: int, depth=None, rng=None):
    from cwsl_digi_tpu.modes.base import get_decoder
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    rng = rng or np.random.default_rng(42)
    kwargs = {}
    if depth and mode in ("FT8", "FT4"):
        kwargs["depth"] = depth
    dec = get_decoder(mode, **kwargs)

    # synthesize per-mode reference messages
    if mode == "WSPR":
        from cwsl_digi_tpu.modes import wspr as m
        clean = m.synthesize("K1ABC", "FN42", 30, 1512.34)
        want = "K1ABC FN42 30"
        def fmt(r): return f"{r.message}"
    elif mode == "JT65":
        from cwsl_digi_tpu.modes import jt65 as m
        clean = m.synthesize("K1ABC W9XYZ EN37", 1270.5)
        want = "K1ABC W9XYZ EN37"
        def fmt(r): return r.message
    elif mode == "Q65-30":
        from cwsl_digi_tpu.modes import q65 as m
        clean = m.synthesize("K1ABC W9XYZ EN37", 1000.0)
        want = "K1ABC W9XYZ EN37"
        def fmt(r): return r.message
    elif mode.startswith("FST4"):
        from cwsl_digi_tpu.constants import Mode
        from cwsl_digi_tpu.modes import fst4 as m
        if mode.startswith("FST4W"):
            clean = m.synthesize("K1ABC FN42 30", Mode(mode), 1500.0)
            want = "K1ABC FN42 30"
        else:
            clean = m.synthesize("K1ABC W9XYZ EN37", Mode(mode), 1000.0)
            want = "K1ABC W9XYZ EN37"
        def fmt(r): return r.message
    elif mode == "FT4":
        from cwsl_digi_tpu.modes import ft4 as m
        clean = m.synthesize("K1ABC W9XYZ EN37", 1500.0)
        want = "K1ABC W9XYZ EN37"
        def fmt(r): return r.message
    elif mode == "JS8":
        from cwsl_digi_tpu.modes import js8 as m
        clean = m.synthesize("CQCQ K1ABC", 1500.0)
        want = None  # any decode counts
        def fmt(r): return r.message
    else:
        from cwsl_digi_tpu.modes import ft8 as m
        clean = m.synthesize("K1ABC W9XYZ EN37", 1500.0)
        want = "K1ABC W9XYZ EN37"
        def fmt(r): return r.message

    print(f"== {mode} (trials={trials}) ==")
    curve = {}
    for snr in snrs:
        wins = np.stack([
            add_noise_at_snr(clean, float(snr), 12000, rng)
            for _ in range(trials)
        ])
        res = dec.decode(wins)
        ok = 0
        for rl in res:
            msgs = [fmt(r) for r in rl]
            if (want in msgs) if want else bool(msgs):
                ok += 1
        curve[float(snr)] = ok / trials
        print(f"  SNR {snr:+6.1f} dB: {ok}/{trials} = {ok/trials:.0%}")
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="*", default=["FT8"])
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--snrs", type=str, default="")
    ap.add_argument("--depth", type=int, default=None)
    args = ap.parse_args()

    default_snrs = {
        "FT8": [-18, -19, -20, -21, -22],
        "FT4": [-15, -16, -17, -18],
        "WSPR": [-22, -24, -26, -28, -30],
        "JT65": [-21, -22, -23, -24, -25],
        "Q65-30": [-18, -20, -22, -24, -26],
        "FST4-60": [-22, -23, -24, -25],
        "FST4W-120": [-26, -28, -30, -32],
        "JS8": [-18, -20, -22],
    }
    for mode in args.modes or ["FT8"]:
        snrs = ([float(s) for s in args.snrs.split(",")] if args.snrs
                else default_snrs.get(mode, [-15, -18, -21]))
        sweep(mode, snrs, args.trials, depth=args.depth)


if __name__ == "__main__":
    main()
