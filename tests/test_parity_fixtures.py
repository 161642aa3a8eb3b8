"""Committed-WAV regression: decode fixed input fixtures, expect messages.

The fixtures in tests/fixtures/ are protocol-exact signals written once by
``tools/parity.py --fixtures`` (int16 WAV, the reference's keepwav format —
source/WaveFile.hpp:19-135).  Because they are committed *files*, they are
decoupled from the live synthesis code: any codec/table drift that would
break decoding of previously-valid on-air-format signals fails here even
if encode+decode still round-trip against each other.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE_DIR = Path(__file__).parent / "fixtures"
MANIFEST = json.loads((FIXTURE_DIR / "manifest.json").read_text())


@pytest.mark.parametrize("entry", MANIFEST, ids=[e["file"] for e in MANIFEST])
def test_fixture_decodes(entry):
    from cwsl_digi_tpu.modes.base import get_decoder
    from cwsl_digi_tpu.utils.wav import read_wav

    audio, sr = read_wav(FIXTURE_DIR / entry["file"])
    assert sr == 12000
    dec = get_decoder(entry["mode"])
    results = dec.decode(np.asarray(audio, dtype=np.float32)[None, :])[0]
    msgs = [r.message for r in results]
    assert entry["message"] in msgs, (
        f"{entry['file']}: expected {entry['message']!r}, got {msgs}")
    # metadata sanity on the matching decode
    r = next(r for r in results if r.message == entry["message"])
    assert abs(r.freq_hz - entry["f0_hz"]) < 3.0
    assert abs(r.snr_db - entry["snr_db"]) < 4.0
