"""SNR-estimator calibration check: reported vs injected SNR per mode.

The reference reports jt9/wsprd SNRs verbatim to PSK Reporter / WSPRNet
(source/OutputHandler.cpp:505-621); the native estimators must match the
WSJT-X convention (signal power over noise in 2.5 kHz) to ~1 dB or the
reported spots skew every consumer's statistics.  Each engine carries a
per-mode ``snr_offset_db`` calibrated with this tool (run it after any
demod/normalization change):

    python tools/snr_check.py [modes...] [--trials N]

Prints per-mode bias/std of (reported - injected) over randomized
protocol-exact signals at -10/-15 dB.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

DEFAULT_MODES = ("FT8", "FT4", "JS8", "WSPR", "JT65", "Q65-30",
                 "FST4-60", "FST4W-120")


def measure(mode: str, trials: int = 8, snrs=(-10.0, -15.0),
            rng=None) -> np.ndarray:
    from parity import SWEEPS, make_trial

    from cwsl_digi_tpu.modes.base import get_decoder
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    rng = rng or np.random.default_rng(3)
    dec = get_decoder(mode)
    errs = []
    for snr in snrs:
        wins, wants = [], []
        for _ in range(trials):
            if mode == "JS8":
                # one-frame text payload (the generic two-call trial
                # overflows JS8's 12-char text frame)
                f0 = float(rng.uniform(600, 2400))
                wins.append(add_noise_at_snr(
                    __import__("cwsl_digi_tpu.modes.js8",
                               fromlist=["synthesize"]).synthesize(
                        "HELLO TU 73", f0, start_s=0.4),
                    snr, 12000, rng))
                wants.append("HELLO TU 73")
                continue
            clean, want = make_trial(mode, rng, SWEEPS[mode]["f0"],
                                     SWEEPS[mode]["dt"])
            wins.append(add_noise_at_snr(clean, snr, 12000, rng))
            wants.append(want)
        res = dec.decode(np.stack(wins))
        for want, rl in zip(wants, res):
            errs += [r.snr_db - snr for r in rl if r.message == want]
    return np.asarray(errs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="*", default=list(DEFAULT_MODES))
    ap.add_argument("--trials", type=int, default=8)
    args = ap.parse_args()

    from cwsl_digi_tpu import jaxcache
    jaxcache.enable()

    for mode in args.modes or DEFAULT_MODES:
        errs = measure(mode, args.trials)
        if len(errs) == 0:
            print(f"{mode:10s} no decodes")
            continue
        print(f"{mode:10s} n={len(errs):3d} bias={errs.mean():+5.2f} dB"
              f"  std={errs.std():.2f}")


if __name__ == "__main__":
    main()
