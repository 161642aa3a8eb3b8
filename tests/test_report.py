"""Reporting layer tests: spot grammar, PSK Reporter / RBN / WSPRNet wire
formats, stats."""

import struct

import numpy as np
import pytest

from cwsl_digi_tpu.constants import Mode
from cwsl_digi_tpu.modes.base import DecodeResult
from cwsl_digi_tpu.report import pskreporter as psk
from cwsl_digi_tpu.report import rbn
from cwsl_digi_tpu.report.spot import Spot, SpotHandler, extract_spot
from cwsl_digi_tpu.report.wsprnet import MODE_CODES, WSPRNet, build_post_fields
from cwsl_digi_tpu.stats import Stats


def _res(msg, mode=Mode.FT8, snr=-12.0, dt=0.1, freq=1500.0):
    return DecodeResult(message=msg, snr_db=snr, dt_s=dt, freq_hz=freq, mode=mode)


# ---------------------------------------------------------------------------
# Spot grammar (reference: OutputHandler.cpp:924-1128)
# ---------------------------------------------------------------------------
def test_extract_cq_with_grid():
    s = extract_spot(_res("CQ W2AXR FN13"), 14_074_000)
    assert s.callsign == "W2AXR" and s.locator == "FN13"
    assert s.freq_hz == 14_075_500


def test_extract_cq_dx():
    s = extract_spot(_res("CQ DX VE3XYZ EN93"), 14_074_000)
    assert s.callsign == "VE3XYZ" and s.locator == "EN93"


def test_extract_standard_exchange():
    s = extract_spot(_res("K1ABC W9XYZ -15"), 7_074_000)
    assert s.callsign == "W9XYZ" and s.report == "-15" and s.locator == ""
    s = extract_spot(_res("K1ABC W9XYZ EN34"), 7_074_000)
    assert s.callsign == "W9XYZ" and s.locator == "EN34"
    s = extract_spot(_res("K1ABC W9XYZ RR73"), 7_074_000)
    assert s.callsign == "W9XYZ" and s.locator == ""


def test_extract_rejects_bad_calls():
    assert extract_spot(_res("CQ FN13"), 14_074_000) is None       # grid not call
    assert extract_spot(_res("TNX 73 GL"), 14_074_000) is None     # free text
    assert extract_spot(_res(""), 14_074_000) is None


def test_sotamat_message():
    # reference: isSOTAMATMessage, OutputHandler.cpp:889-922
    # "STMT W2AXR/23" is exactly 13 chars with a valid 2-char suffix
    s = extract_spot(_res("STMT W2AXR/23"), 14_074_000)
    assert s is not None and s.callsign == "W2AXR"
    # non-SOTAmat forms fall through to the generic two-word grammar,
    # which reports the second word verbatim
    s = extract_spot(_res("XTMT W2AXR/23"), 14_074_000)
    assert s.callsign == "W2AXR/23"


def test_wspr_reporter_override():
    from cwsl_digi_tpu.report.wsprnet import WSPRNet

    calls = []
    w = WSPRNet("FN13", "W2AXR", post_fn=lambda f: calls.append(f) or True,
                start_thread=False)
    s = _spot(mode=Mode.WSPR)
    s.locator = "EN34"
    s.wspr_reporter_call = "W2AXR/P"
    w.handle(s)
    w.flush()
    assert calls[0]["rcall"] == "W2AXR/P"


def test_extract_hashed_call_and_error_flags():
    s = extract_spot(_res("K1ABC <PJ4/K1XYZ> RR73 ?"), 14_074_000)
    assert s.callsign == "PJ4/K1XYZ"


def test_spothandler_fanout_and_ignore(tmp_path):
    got = []

    class FakeReporter:
        def handle(self, spot):
            got.append(spot)

    stats = Stats(num_decoders=2)
    h = SpotHandler(reporters=[FakeReporter()], stats=stats,
                    ignored_calls=["N0CALL"],
                    decodes_file=str(tmp_path / "decodes.txt"),
                    bad_msg_log=str(tmp_path / "bad.txt"))
    assert h.handle(_res("CQ W2AXR FN13"), 14_074_000, 0) is not None
    assert h.handle(_res("CQ N0CALL FN13"), 14_074_000, 0) is None   # ignored
    assert h.handle(_res("GARBAGE"), 14_074_000, 0) is None          # bad
    assert len(got) == 1
    assert stats.get_counts(0, 60) == 1
    assert "W2AXR" in (tmp_path / "decodes.txt").read_text()
    assert "GARBAGE" in (tmp_path / "bad.txt").read_text()


# ---------------------------------------------------------------------------
# PSK Reporter wire format (reference: PSKReporter.cpp)
# ---------------------------------------------------------------------------
def _spot(call="W9XYZ", loc="EN34", freq=14_075_500, mode=Mode.FT8, t=None):
    import time as _time

    # the dedupe window compares against the real clock, so default to "now"
    return Spot(callsign=call, freq_hz=freq, base_freq_hz=14_074_000,
                snr_db=-12, dt_s=0.1, mode=mode, message="x", locator=loc,
                epoch_time=t or int(_time.time()))


def test_psk_header_layout():
    h = psk.build_header(0x11223344, 7, 0xDEADBEEF)
    assert h[:2] == b"\x00\x0A"
    assert h[2:4] == b"\x00\x00"              # length placeholder
    assert h[4:8] == b"\x11\x22\x33\x44"      # epoch
    assert struct.unpack(">I", h[8:12])[0] == 7
    assert h[12:16] == b"\xDE\xAD\xBE\xEF"


def test_psk_sender_record_with_locator():
    r = psk.build_sender_record(_spot(t=1_700_000_000))
    assert r[:2] == b"\x64\xAF"
    assert struct.unpack(">H", r[2:4])[0] == len(r)
    assert len(r) % 4 == 0
    assert r[4] == 5 and r[5:10] == b"W9XYZ"
    assert struct.unpack(">I", r[10:14])[0] == 14_075_500
    assert struct.unpack("b", r[14:15])[0] == -12
    assert r[15] == 3 and r[16:19] == b"FT8"
    assert r[19] == 4 and r[20:24] == b"EN34"
    assert r[24] == 1                          # info source
    assert struct.unpack(">I", r[25:29])[0] == 1_700_000_000


def test_psk_sender_record_without_locator():
    r = psk.build_sender_record(_spot(loc=""))
    assert r[:2] == b"\x62\xA7"


def test_psk_mode_relabelling():
    r = psk.build_sender_record(_spot(mode=Mode.FST4W_300, loc=""))
    assert b"FST4W" in r and b"FST4W-300" not in r


def test_psk_packets_dedupe_and_size():
    sent = []
    rep = psk.PSKReporter("W2AXR", "FN13", send_fn=sent.append,
                          start_thread=False)
    for i in range(3):
        rep.handle(_spot())          # same call+band+mode -> dedupe to 1
    rep.handle(_spot(call="K1ABC"))
    n = rep.flush()
    assert n == 1
    pkt = sent[0]
    assert len(pkt) <= psk.MAX_UDP_PAYLOAD_SIZE + 64
    assert struct.unpack(">H", pkt[2:4])[0] == len(pkt)
    # descriptors present on early packets
    assert psk.DESCRIPTOR_RECEIVER in pkt
    assert pkt.count(b"W9XYZ") == 1 and b"K1ABC" in pkt
    # second flush with same spot inside 181 s window -> nothing
    rep.handle(_spot())
    assert rep.flush() == 0


def test_psk_band_check():
    assert psk.is_same_band(14_074_000, 14_075_500)
    assert not psk.is_same_band(14_074_000, 7_074_000)
    assert not psk.is_same_band(472_000, 137_000)   # sub-MHz uses 100 kHz


# ---------------------------------------------------------------------------
# RBN datagrams (reference: RBNHandler.hpp)
# ---------------------------------------------------------------------------
def test_rbn_decode_datagram():
    d = rbn.build_wsjtx_decode("PGM", -10, 1500, "FT8", "CQ W2AXR FN13")
    assert d[:4] == b"\xAD\xBC\xCB\xDA"
    assert struct.unpack(">I", d[4:8])[0] == 2    # schema
    assert struct.unpack(">I", d[8:12])[0] == 2   # msg type
    assert b"CQ W2AXR FN13" in d
    # snr as signed i32 right after program + new-decode flag + time
    off = 12 + 4 + len("PGM") + 1 + 4
    assert struct.unpack(">i", d[off:off+4])[0] == -10


def test_rbn_status_on_band_change():
    sent = []
    h = rbn.RBNHandler("W2AXR", "FN13", send_fn=sent.append, start_thread=False)
    h.handle(_spot())
    h.flush()
    assert len(sent) == 2                      # status + decode
    assert struct.unpack(">I", sent[0][8:12])[0] == 1
    assert struct.unpack(">I", sent[1][8:12])[0] == 2
    sent.clear()
    h.handle(_spot(call="K1ABC"))              # same band/mode -> no status
    h.flush()
    assert len(sent) == 1


def test_rbn_custom_status():
    pkts = rbn.build_custom_status(3000, [rbn.DecoderEntry("FT8", 14_074_000),
                                          rbn.DecoderEntry("WSPR", 14_095_600)])
    assert len(pkts) == 1
    d = pkts[0]
    assert d[:8] == bytes([1, 2, 3, 4, 5, 6, 7, 8])
    assert struct.unpack(">I", d[8:12])[0] == 3000
    assert d[12] == 2
    assert struct.unpack(">Q", d[17 + 3 : 17 + 3 + 8])[0] == 14_074_000
    # >255 decoders split across datagrams (count field is one byte)
    many = [rbn.DecoderEntry("FT8", 14_074_000 + i) for i in range(300)]
    pkts = rbn.build_custom_status(3000, many)
    assert len(pkts) == 2 and pkts[0][12] == 255 and pkts[1][12] == 45


# ---------------------------------------------------------------------------
# WSPRNet (reference: WSPRNet.cpp)
# ---------------------------------------------------------------------------
def test_wsprnet_fields():
    s = _spot(mode=Mode.WSPR, freq=14_097_100)
    s.locator = "EN34"
    f = build_post_fields(s, "W2AXR", "FN13", 14_095_600, dbm=37)
    assert f["function"] == "wspr" and f["mode"] == "2"
    assert f["rqrg"] == "14.095600" and f["tqrg"] == "14.097100"
    assert f["tcall"] == "W9XYZ" and f["tgrid"] == "EN34"
    assert f["sig"] == "-12" and f["dbm"] == "37"
    assert len(f["date"]) == 6 and len(f["time"]) == 4


def test_wsprnet_mode_codes():
    # reference code sends 16 for FST4W-900 despite its comment saying 15
    assert MODE_CODES[Mode.FST4W_900] == 16
    assert MODE_CODES[Mode.FST4W_1800] == 30


def test_wsprnet_queue_and_retry():
    calls = []

    def post(fields):
        calls.append(fields)
        return len(calls) >= 3     # fail twice, succeed on 3rd

    w = WSPRNet("FN13", "W2AXR", post_fn=post, start_thread=False)
    w.handle(_spot(mode=Mode.WSPR))
    w.handle(_spot(mode=Mode.FT8))   # non-WSPR modes are not queued
    assert w.flush() == 1
    assert w.count_ok == 1 and len(calls) == 3


# ---------------------------------------------------------------------------
# Stats (reference: Stats.hpp)
# ---------------------------------------------------------------------------
def test_stats_windows_and_prune():
    st = Stats(num_decoders=1)
    now = 1_700_000_000
    st.handle_report(0, now - 30)
    st.handle_report(0, now - 200)
    st.handle_report(0, now - 7000)
    assert st.get_counts(0, 60, now) == 1
    assert st.get_counts(0, 300, now) == 2
    assert st.get_counts(0, 86400, now) == 3
    tbl = st.table(["14074000 FT8"], now=now)
    assert "14074000 FT8" in tbl and "Running" in tbl
