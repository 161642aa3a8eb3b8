"""Calibrate the OSD acceptance gates (ModeSpec.osd_nhard_max/osd_dist_frac).

Measures, for FT8 (or a given mode):
  - recall at threshold SNRs with the OSD pass on;
  - false-decode count + the (dist/wsum, nhard) stats of every OSD-accepted
    codeword on pure-noise windows (gates must keep this at zero).

Usage: python tools/osd_calibrate.py [--trials N] [--noise N] [--snrs a,b]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=25)
    ap.add_argument("--noise", type=int, default=200)
    ap.add_argument("--snrs", type=str, default="-20,-21,-22")
    ap.add_argument("--mode", type=str, default="FT8")
    args = ap.parse_args()

    from cwsl_digi_tpu.modes import ft8, ft4
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    mod = {"FT8": ft8, "FT4": ft4}[args.mode]
    dec = (ft8.FT8Decoder() if args.mode == "FT8" else ft4.FT4Decoder())
    sr = 12000
    rng = np.random.default_rng(7)
    text = "CQ K1ABC FN42"

    for snr in [float(s) for s in args.snrs.split(",")]:
        hits = 0
        batch = []
        for _ in range(args.trials):
            f0 = rng.uniform(400, 2500)
            batch.append(add_noise_at_snr(
                mod.synthesize(text, f0), snr, sr, rng))
        results = dec.decode(np.stack(batch))
        for rs in results:
            if any(r.message == text for r in rs):
                hits += 1
        print(f"SNR {snr:6.1f}: {hits}/{args.trials} = "
              f"{100*hits//args.trials}%", flush=True)

    # noise-only false decode check
    n_samp = int(mod.T_R * sr)
    false_msgs = []
    bs = 25
    for i in range(0, args.noise, bs):
        noise = rng.standard_normal((bs, n_samp)).astype(np.float32)
        for rs in dec.decode(noise):
            false_msgs += [r.message for r in rs]
    print(f"noise windows: {args.noise}, false decodes: {len(false_msgs)}")
    for m in false_msgs[:10]:
        print("  FALSE:", repr(m))


if __name__ == "__main__":
    main()
