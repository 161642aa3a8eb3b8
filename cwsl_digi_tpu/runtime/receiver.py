"""Receiver: one IQ source -> batched channelizer -> windowed decode jobs.

Replaces the reference's Receiver thread + one Instance thread per channel
(source/Receiver.hpp:52-302, source/Instance.cpp:30-344): a single thread
streams IQ blocks through the BatchChannelizer (all channels at once) and
frames per-mode capture windows by *stream time* (sample counting), pushing
one batched DecodeJob per (mode, window) to the pool.

Window framing notes:
- the reference stamps windows with wall-clock UTC and swaps per-channel
  double buffers on cadence ticks (Instance.cpp:203-251); with stream-time
  framing the k-th window covers audio samples [k*T_R*12000, (k+1)*...),
  and the UTC stamp is ``utc_anchor + k*T_R`` — identical for live sources
  (anchored at a UTC boundary) and deterministic for replay;
- the channelizer state is NOT reset between windows (phase-continuous
  streaming); the reference resets SSBD phase per window (Instance.cpp:251)
  only because its decoders are external — decode results are phase
  invariant.
"""

from __future__ import annotations

import enum
import threading
from typing import Callable

import numpy as np

from cwsl_digi_tpu.config import DecoderLine
from cwsl_digi_tpu.constants import WAVE_SR, Mode, get_rx_period
from cwsl_digi_tpu.dsp.channelizer import BatchChannelizer
from cwsl_digi_tpu.runtime.decoderpool import DecodeJob, DecoderPool
from cwsl_digi_tpu.sdr.source import IQSource


class Status(enum.Enum):
    """Reference: source/Receiver.hpp:45-50."""

    NOT_INITIALIZED = "Uninitialized"
    RUNNING = "Running"
    STOPPED = "Stopped"
    FINISHED = "Finished"


class Receiver:
    """One capture source and every decoder line tuned within it."""

    def __init__(
        self,
        source: IQSource,
        lines: list[DecoderLine],
        pool: DecoderPool,
        utc_anchor: float = 0.0,
        log: Callable[[str], None] | None = None,
        decoder_index_base: int = 0,
        line_indices: list[int] | None = None,
        align_live: bool = False,
        channelizer: str = "xla",
    ) -> None:
        self.source = source
        self.lines = list(lines)
        self.pool = pool
        self.log = log or (lambda s: None)
        self.utc_anchor = utc_anchor
        # live sources: discard IQ until wall clock reaches the anchor so
        # stream-time window k really starts at utc_anchor + k*T_R (the
        # reference's cadence threads achieve the same via wall-clock swaps,
        # source/CWSL_DIGI.cpp:174-451)
        self.align_live = align_live
        self._drop_remaining = 0
        self.status = Status.NOT_INITIALIZED
        self._terminate = threading.Event()
        self._thread: threading.Thread | None = None
        self.line_indices = line_indices or [
            decoder_index_base + i for i in range(len(lines))
        ]

        fs = source.sample_rate
        lo = source.lo_freq
        freqs = [line.calibrated_freq - lo for line in lines]
        for line, f in zip(lines, freqs):
            if abs(f) > fs / 2:
                raise ValueError(
                    f"decoder {line.freq} {line.mode.value} outside source band"
                )
        # backend selection (config [tpu] channelizer = xla | pallas).
        # Measured on a v5e chip (bench.py): XLA 4.1 us/channel-second vs
        # Pallas 12.4 — XLA's fused polyphase matmul wins, so it is the
        # default; the Pallas kernel stays as a selectable alternative.
        if channelizer == "pallas":
            from cwsl_digi_tpu.dsp.pallas_channelizer import (
                TILE_C, PallasChannelizer)

            # pad the channel list up to the kernel's channel tile; the
            # extra rows are computed but never referenced by any mode row
            pad = (-len(freqs)) % TILE_C
            self.chan = PallasChannelizer(fs, freqs + [0.0] * pad)
            self._sub_gran = self.chan.tile_t
        elif channelizer == "xla":
            self.chan = BatchChannelizer(fs, freqs)
            self._sub_gran = self.chan._sub
        else:
            raise ValueError(f"unknown channelizer backend {channelizer!r}")

        # group channel rows by mode for window framing
        self._mode_rows: dict[Mode, list[int]] = {}
        for i, line in enumerate(lines):
            self._mode_rows.setdefault(line.mode, []).append(i)
        # per-mode assembly buffers [C_mode, window_samples].  Each mode's
        # windows must start on ITS OWN period boundary (the reference's
        # per-cadence sync threads, CWSL_DIGI.cpp:174-451): audio before the
        # first boundary of T_m at/after utc_anchor is skipped per mode.
        self._buffers: dict[Mode, np.ndarray] = {}
        self._written: dict[Mode, int] = {}
        self._window_index: dict[Mode, int] = {}
        self._skip: dict[Mode, int] = {}
        self._epoch0: dict[Mode, float] = {}
        for mode, rows in self._mode_rows.items():
            trp = get_rx_period(mode)
            n = int(round(trp * WAVE_SR))
            self._buffers[mode] = np.zeros((len(rows), n), np.float32)
            self._written[mode] = 0
            self._window_index[mode] = 0
            k = int(np.ceil((utc_anchor - 1e-6) / trp))
            boundary = max(k, 0) * trp
            self._epoch0[mode] = boundary
            self._skip[mode] = int(round((boundary - utc_anchor) * WAVE_SR))
        self._iq_leftover = np.zeros(0, np.complex64)

    # -- reference API ------------------------------------------------------

    def init(self) -> None:
        self.status = Status.RUNNING
        self._thread = threading.Thread(target=self._run, name="receiver",
                                        daemon=True)
        self._thread.start()

    def terminate(self) -> None:
        self._terminate.set()
        if self._thread is not None:
            self._thread.join(timeout=3.0)
            self._thread = None
        if self.status == Status.RUNNING:
            self.status = Status.STOPPED

    def get_status(self) -> Status:
        return self.status

    # -- processing ---------------------------------------------------------

    def _run(self) -> None:
        import time as _time

        if self.align_live:
            delay = self.utc_anchor - _time.time()
            if delay > 0:
                self._drop_remaining = int(delay * self.source.sample_rate)
        try:
            while not self._terminate.is_set():
                block = self.source.read_block(timeout=1.0)
                if block is None:
                    # live sources time out when the writer is idle — keep
                    # waiting; only a true end-of-stream finishes the
                    # receiver (reference: SM.WaitForNewData timeout just
                    # loops, Receiver.hpp:235-237)
                    if getattr(self.source, "live", False):
                        continue
                    self.status = Status.FINISHED
                    self._flush_partials()
                    return
                if self._drop_remaining > 0:
                    n = min(self._drop_remaining, len(block))
                    self._drop_remaining -= n
                    block = block[n:]
                    if len(block) == 0:
                        continue
                self.process_iq(block)
        except Exception as e:
            self.log(f"### receiver error: {e!r}")
            self.status = Status.STOPPED

    def process_iq(self, block: np.ndarray) -> None:
        """Feed one IQ block (any length); channelize in sub-block units."""
        iq = np.concatenate([self._iq_leftover, np.asarray(block, np.complex64)])
        sub = self._sub_gran
        usable = (len(iq) // sub) * sub
        self._iq_leftover = iq[usable:]
        if usable == 0:
            return
        audio = np.asarray(self.chan.process(iq[:usable]))  # [C, usable/BS]
        self._accumulate(audio)

    def _accumulate(self, audio: np.ndarray) -> None:
        for mode, rows in self._mode_rows.items():
            buf = self._buffers[mode]
            cap = buf.shape[1]
            data = audio[rows]
            if self._skip[mode] > 0:
                drop = min(self._skip[mode], data.shape[1])
                self._skip[mode] -= drop
                if drop == data.shape[1]:
                    continue
                data = data[:, drop:]
            pos = 0
            while pos < data.shape[1]:
                w = self._written[mode]
                n = min(cap - w, data.shape[1] - pos)
                buf[:, w : w + n] = data[:, pos : pos + n]
                self._written[mode] = w + n
                pos += n
                if self._written[mode] == cap:
                    self._emit(mode)

    def _emit(self, mode: Mode) -> None:
        rows = self._mode_rows[mode]
        k = self._window_index[mode]
        trp = get_rx_period(mode)
        job = DecodeJob(
            mode=mode,
            audio=self._buffers[mode].copy(),
            base_freqs=[self.lines[i].freq for i in rows],
            decoder_indices=[self.line_indices[i] for i in rows],
            # exact window-start epoch; FT4 windows start on half
            # seconds, so no int truncation here (wire formats that
            # need integer seconds truncate at the presentation layer)
            epoch_time=self._epoch0[mode] + k * trp,
            wspr_callsigns=[self.lines[i].wspr_call for i in rows],
        )
        self.pool.push(job)
        self._written[mode] = 0
        self._window_index[mode] = k + 1

    def _flush_partials(self) -> None:
        """On end-of-stream, emit any window at least half filled (replay
        convenience; the reference simply loses the partial window)."""
        for mode in self._mode_rows:
            if self._written[mode] >= self._buffers[mode].shape[1] // 2:
                self._buffers[mode][:, self._written[mode]:] = 0.0
                self._written[mode] = self._buffers[mode].shape[1]
                self._emit(mode)
