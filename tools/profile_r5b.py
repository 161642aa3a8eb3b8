"""Step-level timing of FT8Decoder.decode() on the real chip.

Replicates the decode() control flow with timestamps between stages, so
the ~18 ms/window gap between pass-1 device time and the full path gets
attributed: upload, pass1 dispatch, early-exit sync, subtract dispatch,
pass2 dispatch, merge+pack fetch, host unpack.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main() -> None:
    from cwsl_digi_tpu import jaxcache

    jaxcache.enable()
    import jax.numpy as jnp

    from bench_sections import make_busy_windows

    from cwsl_digi_tpu.modes import ft8
    from cwsl_digi_tpu.modes import gfsk_engine as ge

    dec = ft8.FT8Decoder()
    batch = dec.max_device_batch
    batches = [make_busy_windows(batch, seed=5 + i) for i in range(4)]
    dec.decode(batches[0])          # compile everything
    spec = dec.spec

    for rep in (1, 2, 3):
        audio = batches[rep]
        marks = [("start", time.perf_counter())]

        peak = np.abs(audio).max(axis=1, keepdims=True)
        scaled = (audio * (32000.0 / np.maximum(peak, 1e-30))
                  ).astype(np.int16)
        marks.append(("host-scale", time.perf_counter()))
        audio_dev = jnp.asarray(scaled).astype(jnp.float32)
        np.asarray(audio_dev[0, :1])
        marks.append(("upload+settle", time.perf_counter()))

        outs = [dec.decode_arrays_device(audio_dev)]
        marks.append(("pass1-dispatch", time.perf_counter()))
        any1 = bool(np.asarray(jnp.any(outs[-1]["valid"])))
        marks.append(("pass1-sync(any)", time.perf_counter()))
        assert any1
        work = ge._select_and_subtract(spec, dec.SUB_MAX, audio_dev,
                                       tuple(outs), dec._hash_w,
                                       dec._gen_parity_f32)
        marks.append(("subtract-dispatch", time.perf_counter()))
        outs.append(dec.decode_arrays_device(work, dec._later_pass_spec))
        marks.append(("pass2-dispatch", time.perf_counter()))
        packed = np.asarray(ge._merge_and_pack(tuple(outs)))
        marks.append(("merge+pack+fetch", time.perf_counter()))
        n_info = dec._crc_mat.shape[0] + dec._crc_mat.shape[1]
        out = dec._parse_packed(packed, n_info)
        n_payload = dec._crc_mat.shape[0]
        seen = [dict() for _ in range(batch)]
        for wi, k in np.argwhere(out["valid"]):
            key = np.packbits(
                out["payload"][wi, k, :n_payload].astype(np.uint8)).tobytes()
            score = float(out["score"][wi, k])
            prev = seen[wi].get(key)
            if prev is None or score > prev[0]:
                seen[wi][key] = (score, int(k))
        n = 0
        for wi in range(batch):
            for score, k in seen[wi].values():
                dec.unpack(np.asarray(out["payload"][wi, k, :n_payload]))
                n += 1
        marks.append(("host-unpack", time.perf_counter()))

        total = marks[-1][1] - marks[0][1]
        print(f"--- rep {rep}: total {1e3 * total / batch:.2f} ms/win "
              f"({n} msgs) ---", flush=True)
        for (name, t), (_, tp) in zip(marks[1:], marks[:-1]):
            print(f"  {name:>18}: {1e3 * (t - tp) / batch:6.2f} ms/win")


if __name__ == "__main__":
    main()
