"""Tests for the mode-codec building blocks: CRC, LDPC, 77-bit messages."""

import numpy as np
import pytest

from cwsl_digi_tpu.modes import message77
from cwsl_digi_tpu.modes.crc import check_ft8_crc, ft8_crc, ft8_crc_matrix
from cwsl_digi_tpu.modes.ldpc import ft8_code, fst4_code, get_bp_decoder


def test_crc_linearity_and_matrix():
    rng = np.random.default_rng(0)
    m = ft8_crc_matrix()
    for _ in range(10):
        p = rng.integers(0, 2, 77).astype(np.uint8)
        assert np.all((p @ m) % 2 == ft8_crc(p))
    p = rng.integers(0, 2, 77).astype(np.uint8)
    word = np.concatenate([p, ft8_crc(p)])
    assert check_ft8_crc(word)
    word[5] ^= 1
    assert not check_ft8_crc(word)


def test_ldpc_code_properties():
    code = ft8_code()
    assert (code.n, code.k) == (174, 91)
    assert code.h.shape == (83, 174)
    assert np.all(code.h.sum(axis=0) == 3)  # column weight 3
    info = np.random.default_rng(1).integers(0, 2, 91).astype(np.uint8)
    cw = code.encode(info)
    assert np.all(code.syndrome(cw) == 0)
    cw[0] ^= 1
    assert np.any(code.syndrome(cw) != 0)
    c2 = fst4_code()
    assert (c2.n, c2.k) == (240, 101)


def test_ldpc_bp_decodes_noisy_codewords():
    rng = np.random.default_rng(2)
    code = ft8_code()
    bp = get_bp_decoder("ft8", iters=30)
    batch = 16
    infos = rng.integers(0, 2, (batch, 91)).astype(np.uint8)
    cws = np.stack([code.encode(i) for i in infos])
    # BPSK-ish LLRs at moderate noise: sign flips on ~4 bits per word
    llr = (1.0 - 2.0 * cws) * 4.0
    llr += rng.standard_normal(llr.shape) * 2.0
    hard, ok = bp.decode(np.asarray(llr, np.float32))
    hard, ok = np.asarray(hard), np.asarray(ok)
    n_ok = 0
    for i in range(batch):
        if ok[i]:
            assert np.all(hard[i] == cws[i])
            n_ok += 1
    assert n_ok >= batch - 2  # min-sum should fix nearly all at this SNR


def test_ldpc_bp_rejects_noise():
    rng = np.random.default_rng(3)
    bp = get_bp_decoder("ft8", iters=20)
    llr = rng.standard_normal((8, 174)).astype(np.float32) * 3.0
    _, ok = bp.decode(llr)
    assert not np.any(np.asarray(ok))


@pytest.mark.parametrize(
    "text",
    [
        "CQ W2AXR FN13",
        "CQ DX K1ABC FN42",
        "W2AXR K1ABC FN42",
        "K1ABC W9XYZ -15",
        "K1ABC W9XYZ R-08",
        "K1ABC W9XYZ RRR",
        "K1ABC W9XYZ RR73",
        "K1ABC W9XYZ 73",
        "CQ 021 K1ABC FN42",
        "W2AXR K1ABC",
    ],
)
def test_message77_roundtrip(text):
    bits = message77.pack77(text)
    assert bits.shape == (77,)
    msg = message77.unpack77(bits)
    assert msg.text == text


def test_message77_free_text():
    bits = message77.pack77("TNX BOB 73 GL")
    msg = message77.unpack77(bits)
    assert msg.is_free_text
    assert msg.text == "TNX BOB 73 GL"


def test_message77_type4_nonstandard():
    # CQ with a compound call carries the full call (type 4)
    bits = message77.pack77("CQ PJ4/K1ABC")
    m = message77.unpack77(bits)
    assert m.i3 == 4 and m.text == "CQ PJ4/K1ABC" and m.is_cq
    # exchange with a nonstandard call: other call is hashed but resolves
    # because it was registered at pack time
    bits = message77.pack77("PJ4/K1ABC W9XYZ 73")
    m = message77.unpack77(bits)
    assert m.i3 == 4
    assert m.text == "PJ4/K1ABC <W9XYZ> 73"
    bits = message77.pack77("K1ABC VE3/W9XYZ RR73")
    m = message77.unpack77(bits)
    assert m.text == "<K1ABC> VE3/W9XYZ RR73"
    assert m.call2 == "VE3/W9XYZ"


def test_message77_call_packing():
    for call in ["W2AXR", "K1ABC", "VE3XYZ", "2E0ABC", "W1AW"]:
        c = message77.pack_call28(call)
        assert message77.unpack_call28(c) == call
    # hashed nonstandard call
    c = message77.pack_call28("PJ4/K1ABC")
    assert message77.unpack_call28(c) == "<PJ4/K1ABC>"


def test_message77_grid_fields():
    m = message77.unpack77(message77.pack77("CQ W2AXR FN13"))
    assert m.is_cq and m.grid == "FN13" and m.call2 == "W2AXR"
    m = message77.unpack77(message77.pack77("K1ABC W9XYZ -15"))
    assert m.report == "-15"


def test_contest_and_special_message_types():
    """i3=0.1/0.3/0.4/0.5, i3=3, i3=5 and /R //P suffixes round-trip
    (reference parses these from jt9 stdout, OutputHandler.cpp:924-1128)."""
    from cwsl_digi_tpu.modes import message77 as m

    m.register_call("KH1/KH7Z")
    m.register_call("G4ABC")
    m.register_call("PA9XYZ")
    cases = [
        ("K1ABC RR73; W9XYZ <KH1/KH7Z> -08", 0),   # 0.1 DXpedition
        ("WA9XYZ KA1ABC R 16A EMA", 0),            # 0.3 Field Day
        ("WA9XYZ KA1ABC 32A SNJ", 0),              # 0.4 Field Day 17-32
        ("123456789ABCDEF012", 0),                 # 0.5 telemetry
        ("K1ABC W9XYZ 579 WI", 3),                 # RTTY RU state
        ("TU; K1ABC W9XYZ R 559 0013", 3),         # RTTY RU serial + TU;
        ("<G4ABC> <PA9XYZ> R 570007 JO22DB", 5),   # EU VHF
        ("<G4ABC> <PA9XYZ> 520001 IO91NP", 5),
        ("K1ABC/R W9XYZ/R EN37", 1),               # rovers
        ("PA3XYZ/P G4ABC/P RR73", 2),              # EU VHF /P
        ("CQ K1ABC FN42", 1),
        ("TNX BOB 73 GL", 0),                      # still free text
    ]
    for text, want_i3 in cases:
        out = m.unpack77(m.pack77(text))
        assert out.text == text, (text, out.text)
        assert out.i3 == want_i3, (text, out.i3)


def test_contest_spot_extraction():
    """Contest exchanges must not be mistaken for grids; senders and
    reports still extract (reference OutputHandler.cpp:924-1128)."""
    from cwsl_digi_tpu.constants import Mode
    from cwsl_digi_tpu.modes.base import DecodeResult
    from cwsl_digi_tpu.report.spot import extract_spot

    def spot(msg):
        return extract_spot(
            DecodeResult(msg, -10, 0.1, 1500.0, mode=Mode.FT8),
            14_074_000, epoch_time=0)

    s = spot("K1ABC W9XYZ 579 WI")
    assert s.callsign == "W9XYZ" and s.locator == ""
    s = spot("WA9XYZ KA1ABC R 16A EMA")
    assert s.callsign == "KA1ABC" and s.locator == ""
    s = spot("K1ABC RR73; W9XYZ <KH1/KH7Z> -08")
    assert s.callsign == "KH1/KH7Z" or s.callsign == "W9XYZ"
    s = spot("<G4ABC> <PA9XYZ> R 570007 JO22DB")
    assert s.callsign == "PA9XYZ" and s.locator == "JO22DB"


def test_snr_estimator_matches_injected():
    """Reported SNR must match the injected WSJT-X-convention SNR to ~1 dB
    (reference forwards jt9 SNRs verbatim to the reporters,
    OutputHandler.cpp:505-621).  Full per-mode sweep: tools/snr_check.py."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from snr_check import measure

    for mode in ("FT8", "FT4"):
        errs = measure(mode, trials=4, snrs=(-10.0,))
        assert len(errs) >= 3, mode
        assert abs(float(errs.mean())) < 0.8, (mode, errs)
