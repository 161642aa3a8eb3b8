"""Two-process jax.distributed skim: the DCN-spanning multi-host path.

The reference scales across hosts by running one CWSL_DIGI per PC and
aggregating spots; here the equivalent is the sharded skim step over a
process-spanning mesh (SPMD via jax.distributed) plus the TCP spot
aggregation in parallel/cluster.py.  This test runs TWO separate Python
processes (4 virtual CPU devices each) that form one 8-device global mesh,
channelize+decode an 8-channel bank, and each report the channels they own;
the process owning the channel with the injected FT8 burst must decode it.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:%(port)d",
                           num_processes=2, process_id=int(sys.argv[1]))
import numpy as np
from jax.sharding import Mesh

from cwsl_digi_tpu.modes import ft8
from cwsl_digi_tpu.modes.gfsk import gfsk_modulate_iq
from cwsl_digi_tpu.parallel.pipeline import ShardedSkimStep

fs = 192_000
n_ch = 8
freqs = np.linspace(-80_000, 80_000, n_ch)
text = "CQ W2AXR FN13"
target = 5                                  # channel carrying the burst

rng = np.random.default_rng(7)              # same IQ on both processes
n = fs * 15
iq = 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
sps_iq = ft8.SPS * fs // 12_000
burst = gfsk_modulate_iq(ft8.encode_message(text), freqs[target] + 1500.0,
                         sps_iq, fs, ft8.TONE_SPACING)
start = int(0.5 * fs)
iq[start : start + len(burst)] += 0.1 * burst
iq = iq.astype(np.complex64)

mesh = Mesh(np.array(jax.devices()), ("ch",))
assert len(jax.devices()) == 8 and jax.local_device_count() == 4
step = ShardedSkimStep(fs, freqs, mesh,
                       decoder=ft8.FT8Decoder(top_k=16, bp_iters=20))
results = step.decode_window(iq)
local = step.local_channels
assert len(results) == len(local), (len(results), len(local))
got = {ch: [r.message for r in rl] for ch, rl in zip(local, results)}
print("RESULT " + json.dumps({"pid": int(sys.argv[1]), "local": local,
                              "decodes": got}), flush=True)
"""


def test_two_process_distributed_skim():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    code = _WORKER % {"repo": str(REPO), "port": port}
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-3000:]
        outs.append(json.loads(line[-1][len("RESULT "):]))

    all_local = sorted(ch for o in outs for ch in o["local"])
    assert all_local == list(range(8))       # disjoint full coverage
    decodes = {int(ch): msgs for o in outs
               for ch, msgs in o["decodes"].items()}
    assert "CQ W2AXR FN13" in decodes[5]
    quiet = [ch for ch in range(8) if ch != 5]
    assert all(not decodes[ch] for ch in quiet)
