"""FST4/FST4W family and JS8 decoder tests."""

import numpy as np
import pytest

from cwsl_digi_tpu.constants import Mode
from cwsl_digi_tpu.modes import fst4, js8
from cwsl_digi_tpu.modes.base import get_decoder
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr


def test_fst4_crc_matrix():
    rng = np.random.default_rng(0)
    m = fst4.fst4_crc_matrix()
    p = rng.integers(0, 2, 77).astype(np.uint8)
    np.testing.assert_array_equal((p @ m) % 2, fst4.fst4_crc(p))


def test_fst4_specs_cover_all_variants():
    for mode, (period, is_w) in fst4._FST4_MODES.items():
        spec = fst4.make_spec(mode)
        burst_s = spec.n_sym * spec.sps / 12000
        assert burst_s < period, f"{mode}: burst {burst_s}s exceeds slot"
        assert burst_s > 0.75 * period


def test_fst4_60_decode():
    dec = fst4.FST4Decoder(Mode.FST4_60, top_k=16, bp_iters=30)
    text = "K1ABC W9XYZ -15"
    audio = fst4.synthesize(text, Mode.FST4_60, f0_hz=1000.0)
    res = dec.decode(audio)[0]
    assert res and res[0].message == text
    rng = np.random.default_rng(1)
    noisy = add_noise_at_snr(fst4.synthesize(text, Mode.FST4_60, 1100.0),
                             -20.0, 12000, rng)
    res = dec.decode(noisy)[0]
    assert any(r.message == text for r in res)


def test_fst4w_120_decode():
    dec = fst4.FST4Decoder(Mode.FST4W_120, top_k=16, bp_iters=30)
    text = "W2AXR FN13 30"
    audio = fst4.synthesize(text, Mode.FST4W_120, f0_hz=1500.0)
    res = dec.decode(audio)[0]
    assert res and res[0].message == text


def _long_period_roundtrip(mode: Mode, snr_db: float, f0: float,
                           text: str, seed: int) -> None:
    """Synthesize -> add noise at `snr_db` -> full decode, one window.

    Execution evidence for the long T/R periods the reference runs via
    ``jt9 -7/-W -p {300,900,1800}`` (source/DecoderPool.hpp:490-573,
    649-659): a 900 s window is 10.8 M samples and 1800 s is 21.6 M
    samples through the rfft spectrogram path — these tests prove memory
    fit, sync, demod, and FEC end-to-end, not just spec construction.
    """
    rng = np.random.default_rng(seed)
    clean = fst4.synthesize(text, mode, f0, start_s=1.0)
    win = add_noise_at_snr(clean, snr_db, 12000, rng)
    res = fst4.FST4Decoder(mode).decode(win[None, :])[0]
    assert any(r.message == text for r in res), (mode, snr_db, res)


def test_fst4_300_decode():
    _long_period_roundtrip(Mode.FST4_300, -20.0, 1000.0,
                           "K1ABC W9XYZ EN37", 0)


def test_fst4_900_decode():
    _long_period_roundtrip(Mode.FST4_900, -24.0, 1000.0,
                           "K1ABC W9XYZ EN37", 0)


def test_fst4_1800_decode():
    _long_period_roundtrip(Mode.FST4_1800, -26.0, 1000.0,
                           "K1ABC W9XYZ EN37", 0)


def test_fst4w_300_decode():
    _long_period_roundtrip(Mode.FST4W_300, -24.0, 1500.0,
                           "K1ABC FN42 30", 0)


def test_fst4w_1800_decode():
    _long_period_roundtrip(Mode.FST4W_1800, -28.0, 1500.0,
                           "K1ABC FN42 30", 0)


def test_fst4w_900_strong_signal_int16_scale():
    """Regression: a STRONG long-FST4 burst through the production
    ``decode()`` path (int16 peak-scaled upload).  Long frames at int16
    scale put per-bin energies near 1e18; the squares summed inside the
    LLR variance overflowed float32 (inf std -> zero LLRs), silently
    dropping any FST4W-900/1800 signal above ~+30 dB — found when the
    multichip dryrun first injected a real signal."""
    rng = np.random.default_rng(3)
    win = fst4.synthesize("K1ABC FN42 30", Mode.FST4W_900, 1500.0,
                          start_s=1.0)
    noisy = add_noise_at_snr(win, 25.0, 12000, rng)
    res = fst4.FST4Decoder(Mode.FST4W_900).decode(noisy[None])[0]
    assert any(r.message == "K1ABC FN42 30" for r in res), res


def test_fst4_noise_rejection():
    dec = fst4.FST4Decoder(Mode.FST4_60, top_k=16, bp_iters=20)
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(int(60 * 12000)).astype(np.float32)
    assert dec.decode(noise)[0] == []


def test_js8_payload_roundtrip():
    for text in ["CQ CQ CQ", "HELLO WORLD?"]:
        bits = js8.pack_payload(text)
        assert bits.shape == (75,)
        assert js8.unpack_payload(bits) == text[:12].strip()


def test_js8_varicode_huffman_layer():
    """The huffman varicode machinery (JS8Call varicode.cpp analogue,
    compiled into the reference via CWSL_DIGI.vcxproj:22-24): prefix-free
    codebook, EOT termination, zero-padded tail, frame-budget packing."""
    from cwsl_digi_tpu.modes import js8_varicode as vc

    table = vc.default_table()
    vc.validate_table(table)                      # prefix-free, has EOT
    assert set(table) == set(vc.ALPHABET)
    # common chars get shorter codes than rare ones
    assert len(table[" "]) < len(table["Z"])
    assert len(table["E"]) < len(table["Q"])
    # stream round trip with zero padding (the frame tail discipline)
    for text in ["HELLO", "73 DE K1ABC", "SO? YES!", ""]:
        bits = vc.encode(text, budget=72)
        assert bits is not None and len(bits) == 72
        assert vc.decode(bits) == text
    # budget refusal
    assert vc.encode("CQ CQ DE K1ABC K1ABC", budget=72) is None
    # non-codebook char refusal (lowercase is folded, control chars not)
    assert vc.encode("\x01", budget=72) is None


def test_js8_huffman_beats_6bit_charset():
    """Huffman text frames carry more than the 12-char fixed budget."""
    text = "TO THE SEA AT TEN"                    # 17 chars, common letters
    bits = js8.pack_payload(text)
    assert bits.shape == (75,)
    assert js8.unpack_payload(bits) == text       # no truncation


def test_js8_multiframe_text_reassembly():
    """Long conversations chunk across 15 s frames (JS8Call behavior);
    concatenating the per-frame decodes reproduces the text exactly."""
    msg = "CQ CQ DE K1ABC K1ABC PSE REPLY ON 7078"
    frames = js8.pack_text_frames(msg)
    assert len(frames) > 1
    assert "".join(js8.unpack_payload(f) for f in frames) == msg
    # chunk boundaries that land ON a space must survive reassembly
    # (rare letters shrink the per-frame budget, forcing a split whose
    # boundary falls between words): 'UUU CCC'-style corruption guard.
    for msg in ["ZZZZZ QQQQQ XXXXX JJJJJ", "UUU CCC UUU CCC UUU CCC UU",
                "QQXJ ZZQX JQZX QZJX XQZJ"]:
        frames = js8.pack_text_frames(msg)
        if len(frames) > 1:
            assert "".join(js8.unpack_payload(f) for f in frames) == msg
    # a fragment resembling a directed message must stay a text frame
    # (no reclassification inside pack_text_frames' fallback)
    import numpy as _np
    frag = "\x01K1ABC: W9XYZ 73"      # leading non-codebook char
    frames = js8.pack_text_frames(frag)
    from cwsl_digi_tpu.modes import message77 as _m77
    assert _m77.int_from_bits(frames[0][:3]) == js8.FRAME_TEXT


def test_js8_varicode_override_roundtrip(tmp_path, monkeypatch):
    """A user-supplied codebook (tables_ext js8_varicode.txt) replaces the
    stand-in and the full pack->unpack path uses it."""
    from cwsl_digi_tpu.modes import js8_varicode as vc
    from cwsl_digi_tpu.modes import tables_ext

    lines = []
    for ch, code in vc.default_table().items():
        tok = {" ": "SP", vc.EOT: "EOT"}.get(ch, ch)
        lines.append(f"{tok} {code}")
    (tmp_path / "js8_varicode.txt").write_text("\n".join(lines))
    monkeypatch.setenv(tables_ext.ENV_VAR, str(tmp_path))
    tables_ext.js8_varicode.cache_clear()
    vc._active.cache_clear()
    try:
        assert vc.is_external()
        text = "TEST VIA OVERRIDE"
        assert vc.decode(vc.encode(text, budget=None)) == text
    finally:
        monkeypatch.delenv(tables_ext.ENV_VAR)
        tables_ext.js8_varicode.cache_clear()
        vc._active.cache_clear()


def test_js8_directed_frames():
    for text in ["W2AXR: K1ABC SNR?", "K1ABC: W9XYZ HEARTBEAT",
                 "W2AXR: K1ABC 73", "W2AXR: K1ABC"]:
        bits = js8.pack_payload(text)
        assert js8.unpack_payload(bits) == text
    # unknown command falls back to the text frame (truncated to 12 chars)
    bits = js8.pack_payload("W2AXR: K1ABC BLAHBLAH")
    assert js8.unpack_payload(bits) == "W2AXR: K1ABC"


def test_js8_decode_and_ft8_isolation():
    dec = js8.JS8Decoder(top_k=32, bp_iters=25)
    text = "HELLO WORLD"
    audio = js8.synthesize(text, f0_hz=1500.0)
    res = dec.decode(audio)[0]
    assert res and res[0].message == text
    # an FT8 signal must NOT decode in JS8 (different sync + code)
    from cwsl_digi_tpu.modes import ft8

    ft8_audio = ft8.synthesize("CQ W2AXR FN13", 1500.0)
    rng = np.random.default_rng(3)
    ft8_audio = add_noise_at_snr(ft8_audio, 10.0, 12000, rng)
    assert dec.decode(ft8_audio)[0] == []


def test_registry_constructs_all_modes():
    for mode in [Mode.FT8, Mode.FT4, Mode.WSPR, Mode.JT65, Mode.Q65_30,
                 Mode.JS8, Mode.FST4_60, Mode.FST4W_120]:
        dec = get_decoder(mode)
        assert hasattr(dec, "decode")


def test_fst4_published_frame_structure():
    # genfst4.f90: 160 symbols, the sync word (0,1,3,2,1,0,2,3) at
    # 1-based symbols 1-8, 39-46, 77-84, 115-122, 153-160
    assert fst4.NSYM == 160
    assert fst4.SYNC_WORD == (0, 1, 3, 2, 1, 0, 2, 3)
    assert [off for off, _ in fst4.SYNC_SEQS] == [0, 38, 76, 114, 152]
    assert all(seq == fst4.SYNC_WORD for _, seq in fst4.SYNC_SEQS)
    assert len(fst4.DATA_SYMS) == 120
    # data spans are the four 30-symbol gaps
    gaps = [fst4.DATA_SYMS[i * 30:(i + 1) * 30] for i in range(4)]
    assert gaps[0][0] == 8 and gaps[0][-1] == 37
    assert gaps[3][0] == 122 and gaps[3][-1] == 151


def test_js8_frame_grammar_roundtrips():
    """Heartbeat/compound/directed-with-arg frames round-trip through the
    payload codec (JS8Call's frame families, classified by the reference
    via js8call DecodedText, OutputHandler.cpp:403-503)."""
    from cwsl_digi_tpu.modes import js8

    cases = [
        "KN4CRD: HB EN50",
        "KN4CRD: CQ EN50",
        "KN4CRD: J1Y SNR -12",
        "KN4CRD: J1Y QUERY MSGS",
        "KN4CRD: J1Y HEARING",
        "VE3/KN4CRD: HB",          # compound announce (c58)
    ]
    for text in cases:
        out = js8.unpack_payload(js8.pack_payload(text))
        assert out == text, (text, out)


def test_js8_classify_and_spot():
    from cwsl_digi_tpu.constants import Mode
    from cwsl_digi_tpu.modes import js8
    from cwsl_digi_tpu.modes.base import DecodeResult
    from cwsl_digi_tpu.report.spot import extract_spot

    c = js8.classify("KN4CRD: HB EN50")
    assert c.kind == "HB" and c.from_call == "KN4CRD" and c.grid == "EN50"
    c = js8.classify("KN4CRD: J1Y SNR -12")
    assert c.kind == "DIRECTED" and c.to_call == "J1Y" and c.arg == -12
    c = js8.classify("KN4CRD> VE3ABC> HELLO")
    assert c.kind == "RELAY" and c.relay_path == ("KN4CRD", "VE3ABC")

    s = extract_spot(
        DecodeResult("KN4CRD: HB EN50", -12, 0.1, 1200.0, mode=Mode.JS8),
        7_078_000, epoch_time=0)
    assert s.callsign == "KN4CRD" and s.locator == "EN50"
