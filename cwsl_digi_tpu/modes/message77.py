"""77-bit message payload pack/unpack for FT8/FT4 (and JS8-normal framing).

The reference never packs messages itself — it parses the *text* output of
jt9.exe and re-validates it (source/OutputHandler.cpp:505-621, 924-1128).
A native decoder needs the actual bit-level codec.  This implements the
FT8-style 77-bit payload structure:

    i3 (3 bits, message type) stored in bits 74..76;
    type 1 "standard":  c28 r1 c28 r1 R1 g15   (28+1+28+1+1+15 = 74)
    type 0.0 "free text": 71-bit base-42 packing of 13 chars

c28 field layout (standard-call packing identical in structure to the FT8
protocol: tokens, then a 22-bit hash region, then base-37/36/10/27^3 packed
standard calls):

    0=DE, 1=QRZ, 2=CQ, 3..1002 = "CQ nnn",
    1003..532443             = "CQ A".."CQ ZZZZ" (base-27 letter tags)
    NTOKENS..NTOKENS+MAX22-1 = 22-bit hashed nonstandard calls <CALL>
    NTOKENS+MAX22 + n        = standard callsign, n = packed 6 chars

g15: 0..32399 = 4-char grid; 32400 = blank; 32401=RRR, 32402=RR73,
32403=73; 32404+(report+50) = numeric SNR report (-50..+49 dB).

Every encode/decode path here round-trips by construction and is covered by
tests; the grammar of produced text matches what the reference's
OutputHandler expects to parse (CQ/grid/report/RRR/73 forms,
source/OutputHandler.cpp:924-1128).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cwsl_digi_tpu.modes import tables

NTOKENS = 2_063_592
MAX22 = 4_194_304
MAXGRID4 = 32_400

_C1 = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"   # 37
_C2 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"    # 36
_C3 = "0123456789"                              # 10
_C4 = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"             # 27
_FREE = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ+-./?"  # 42 chars

# Hash tables for calls seen this session (hash value -> call).  The
# reference relies on jt9's equivalent cache; `<...>` displays when the hash
# is unknown (cf. packed-call handling OutputHandler.cpp:788-799).  Every
# call that passes through pack/unpack is registered so later hashed
# references resolve, mirroring WSJT-X's behavior of hashing all calls heard.
_HASH_TABLE: dict[int, str] = {}     # 22-bit
_HASH12_TABLE: dict[int, str] = {}   # 12-bit (type-4 messages)

# base-38 charset for type-4 nonstandard calls (11 chars, 58 bits)
_C58 = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ/"


def bits_from_int(v: int, width: int) -> list[int]:
    return [(v >> (width - 1 - i)) & 1 for i in range(width)]


def int_from_bits(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def hash22(call: str) -> int:
    """WSJT-X 22-bit callsign hash (packjt77.f90 ihashcall, m=22).

    Matches on-air <CALL> hash references from real WSJT-X stations
    (the interop contract behind OutputHandler.cpp:788-799).
    """
    h22 = tables.ihashcall(call.strip(), 22)
    _HASH_TABLE[h22] = call.strip().upper()
    return h22


def hash12(call: str) -> int:
    """WSJT-X 12-bit hash (ihashcall m=12) for type-4 'other call' refs."""
    h12 = tables.ihashcall(call.strip(), 12)
    _HASH12_TABLE[h12] = call.strip().upper()
    return h12


def hash10(call: str) -> int:
    """WSJT-X 10-bit hash (ihashcall m=10), used by 0.5 telemetry-adjacent
    and Q65/i3=5 formats."""
    return tables.ihashcall(call.strip(), 10)


def register_call(call: str) -> None:
    """Record a heard call in every hash table."""
    c = call.strip().strip("<>").upper()
    if len(c) >= 3:
        hash22(c)
        hash12(c)


def _is_standard_call(call: str) -> bool:
    c = call.upper()
    if not (2 <= len(c) <= 6):
        return False
    # align so 3rd char is a digit
    if len(c) >= 3 and c[2].isdigit():
        a = c
    elif len(c) >= 2 and c[1].isdigit():
        a = " " + c
    else:
        return False
    a = a.ljust(6)
    if len(a) != 6:
        return False
    return (
        a[0] in _C1 and a[1] in _C2 and a[2] in _C3
        and all(ch in _C4 for ch in a[3:])
    )


def pack_call28(call: str) -> int:
    """Callsign/token -> c28."""
    c = call.strip().upper()
    if c == "DE":
        return 0
    if c == "QRZ":
        return 1
    if c == "CQ":
        return 2
    if c.startswith("CQ "):
        tag = c[3:].strip()
        if tag.isdigit() and len(tag) <= 3:
            return 3 + int(tag)
        if tag.isalpha() and 1 <= len(tag) <= 4:
            v = 0
            for ch in tag.rjust(4):
                v = v * 27 + _C4.index(ch if ch != " " else " ")
            return 1003 + v
        raise ValueError(f"unencodable CQ tag: {call!r}")
    if c.startswith("<") and c.endswith(">"):
        return NTOKENS + hash22(c[1:-1])
    if _is_standard_call(c):
        a = c if (len(c) >= 3 and c[2].isdigit()) else " " + c
        a = a.ljust(6)
        n = _C1.index(a[0])
        n = n * 36 + _C2.index(a[1])
        n = n * 10 + _C3.index(a[2])
        n = n * 27 + _C4.index(a[3])
        n = n * 27 + _C4.index(a[4])
        n = n * 27 + _C4.index(a[5])
        return NTOKENS + MAX22 + n
    # nonstandard -> hashed
    return NTOKENS + hash22(c)


def unpack_call28(c28: int) -> str:
    if c28 == 0:
        return "DE"
    if c28 == 1:
        return "QRZ"
    if c28 == 2:
        return "CQ"
    if 3 <= c28 <= 1002:
        return f"CQ {c28 - 3:03d}"
    if 1003 <= c28 < NTOKENS:
        v = c28 - 1003
        chars = []
        for _ in range(4):
            chars.append(_C4[v % 27])
            v //= 27
        tag = "".join(reversed(chars)).strip()
        return f"CQ {tag}"
    if NTOKENS <= c28 < NTOKENS + MAX22:
        h = c28 - NTOKENS
        call = _HASH_TABLE.get(h)
        return f"<{call}>" if call else "<...>"
    n = c28 - NTOKENS - MAX22
    c6 = _C4[n % 27]; n //= 27
    c5 = _C4[n % 27]; n //= 27
    c4 = _C4[n % 27]; n //= 27
    c3 = _C3[n % 10]; n //= 10
    c2 = _C2[n % 36]; n //= 36
    c1 = _C1[n % 37]
    return (c1 + c2 + c3 + c4 + c5 + c6).strip()


def pack_grid15(text: str) -> tuple[int, int]:
    """Third-word -> (g15, R-flag)."""
    t = text.strip().upper()
    r = 0
    if t.startswith("R ") and len(t) == 6:
        r = 1
        t = t[2:]
    if t == "":
        return MAXGRID4, r
    if t == "RRR":
        return MAXGRID4 + 1, r
    if t == "RR73":
        return MAXGRID4 + 2, r
    if t == "73":
        return MAXGRID4 + 3, r
    if (len(t) == 4 and t[0] in "ABCDEFGHIJKLMNOPQR" and t[1] in "ABCDEFGHIJKLMNOPQR"
            and t[2].isdigit() and t[3].isdigit()):
        g = ((ord(t[0]) - 65) * 18 + (ord(t[1]) - 65)) * 100 + int(t[2]) * 10 + int(t[3])
        return g, r
    if t.startswith("R+") or t.startswith("R-"):
        r = 1
        t = t[1:]
    if t.startswith(("+", "-")):
        rpt = int(t)
        if -50 <= rpt <= 49:
            return MAXGRID4 + 4 + (rpt + 50), r
    raise ValueError(f"unencodable grid/report: {text!r}")


def unpack_grid15(g15: int, r: int) -> str:
    prefix = "R " if r else ""
    if g15 < MAXGRID4:
        d = g15 % 100
        ab = g15 // 100
        a, b = divmod(ab, 18)
        s = chr(65 + a) + chr(65 + b) + f"{d:02d}"
        return prefix + s
    if g15 == MAXGRID4:
        return prefix.strip()
    if g15 == MAXGRID4 + 1:
        return "RRR"
    if g15 == MAXGRID4 + 2:
        return "RR73"
    if g15 == MAXGRID4 + 3:
        return "73"
    rpt = g15 - MAXGRID4 - 4 - 50
    sign = "+" if rpt >= 0 else "-"
    return f"{'R' if r else ''}{sign}{abs(rpt):02d}"


@dataclasses.dataclass
class Message:
    """A decoded message: text plus structured fields for reporting."""

    text: str
    call1: str = ""      # addressee (or CQ)
    call2: str = ""      # sender
    grid: str = ""       # sender grid if present
    report: str = ""
    i3: int = 1
    is_cq: bool = False
    is_free_text: bool = False


def _is_nonstandard_call(w: str) -> bool:
    c = w.strip("<>")
    return (
        3 <= len(c) <= 11
        and not _is_standard_call(c)
        and all(ch in _C58 for ch in c)
        and any(ch.isdigit() for ch in c)
        and any(ch.isalpha() for ch in c)
    )


def pack77(text: str) -> np.ndarray:
    """Message text -> 77-bit payload (uint8 array)."""
    words = text.strip().upper().split()
    # try standard type-1 forms
    try:
        return _pack_standard(words)
    except ValueError:
        pass
    # type-4: one nonstandard call (compound/prefixed), other call hashed
    try:
        return _pack_nonstandard(words)
    except ValueError:
        pass
    return _pack_free_text(text.strip().upper())


_R2 = {"": 0, "RRR": 1, "RR73": 2, "73": 3}
_R2_INV = {v: k for k, v in _R2.items()}


def _pack_nonstandard(words: list[str]) -> np.ndarray:
    """Type 4: h12 | c58 | flip | r2 | cq | i3=4."""
    if not words:
        raise ValueError("empty")
    cq = 0
    flip = 0
    other = ""
    r2 = 0
    if words[0] == "CQ" and len(words) == 2 and _is_nonstandard_call(words[1]):
        cq = 1
        nonstd = words[1]
    elif len(words) in (2, 3):
        tail = words[2] if len(words) == 3 else ""
        if tail not in _R2:
            raise ValueError("type-4 carries only RRR/RR73/73 suffixes")
        r2 = _R2[tail]
        if _is_nonstandard_call(words[0]):
            nonstd, other, flip = words[0], words[1], 1
        elif _is_nonstandard_call(words[1]):
            nonstd, other, flip = words[1], words[0], 0
        else:
            raise ValueError("no nonstandard call")
        other = other.strip("<>")
        register_call(other)
    else:
        raise ValueError("not a type-4 message")
    nonstd = nonstd.strip("<>")
    register_call(nonstd)
    h12 = hash12(other) if other else 0
    v = 0
    for ch in nonstd.rjust(11):
        v = v * 38 + _C58.index(ch)
    bits = (
        bits_from_int(h12, 12) + bits_from_int(v, 58)
        + [flip] + bits_from_int(r2, 2) + [cq] + bits_from_int(4, 3)
    )
    return np.array(bits, dtype=np.uint8)


def _unpack_nonstandard(bits: np.ndarray) -> Message:
    h12 = int_from_bits(bits[0:12])
    v = int_from_bits(bits[12:70])
    flip = int(bits[70])
    r2 = int_from_bits(bits[71:73])
    cq = int(bits[73])
    chars = []
    for _ in range(11):
        chars.append(_C58[v % 38])
        v //= 38
    nonstd = "".join(reversed(chars)).strip()
    register_call(nonstd)
    if cq:
        text = f"CQ {nonstd}"
        return Message(text=text, call1="CQ", call2=nonstd, i3=4, is_cq=True)
    other = _HASH12_TABLE.get(h12)
    other_disp = f"<{other}>" if other else "<...>"
    suffix = _R2_INV[r2]
    if flip:
        wordsout = [nonstd, other_disp]
        call1, call2 = nonstd, other or ""
    else:
        wordsout = [other_disp, nonstd]
        call1, call2 = other or "", nonstd
    if suffix:
        wordsout.append(suffix)
    return Message(text=" ".join(wordsout), call1=wordsout[0],
                   call2=wordsout[1].strip("<>"), i3=4)


def _pack_call28_strict(call: str) -> int:
    """pack_call28, but a *bare* nonstandard call raises so pack77 prefers
    the type-4 encoding (which carries the call verbatim); explicit
    ``<CALL>`` still packs as a 22-bit hash."""
    c = call.strip().upper()
    if not (c.startswith("<") or c in ("DE", "QRZ", "CQ")
            or c.startswith("CQ ") or _is_standard_call(c)):
        raise ValueError(f"nonstandard call {call!r} needs type 4")
    return pack_call28(c)


def _pack_standard(words: list[str]) -> np.ndarray:
    if not words:
        raise ValueError("empty")
    if words[0] == "CQ":
        # CQ [TAG] CALL [GRID] — a tag is 1-3 digits or 1-4 letters followed
        # by a valid callsign ("CQ DX", "CQ POTA", "CQ 021", ...)
        if len(words) >= 3 and len(words[1]) <= 4 \
                and (words[1].isdigit() or words[1].isalpha()) \
                and _is_standard_call(words[2]):
            c1 = pack_call28(f"CQ {words[1]}")
            rest = words[2:]
        else:
            c1 = pack_call28("CQ")
            rest = words[1:]
        if not rest:
            raise ValueError("CQ without call")
        c2 = _pack_call28_strict(rest[0])
        r2 = 0
        g15, rr = pack_grid15(" ".join(rest[1:])) if len(rest) > 1 else (MAXGRID4, 0)
        return _assemble77(c1, 0, c2, r2, rr, g15, i3=1)
    if len(words) >= 2:
        c1 = _pack_call28_strict(words[0])
        c2 = _pack_call28_strict(words[1])
        tail = " ".join(words[2:])
        g15, rr = pack_grid15(tail) if tail else (MAXGRID4, 0)
        return _assemble77(c1, 0, c2, 0, rr, g15, i3=1)
    raise ValueError("not a standard message")


def _assemble77(c28a: int, r1a: int, c28b: int, r1b: int, rr: int,
                g15: int, i3: int) -> np.ndarray:
    bits = (
        bits_from_int(c28a, 28) + [r1a] + bits_from_int(c28b, 28) + [r1b]
        + [rr] + bits_from_int(g15, 15) + bits_from_int(i3, 3)
    )
    return np.array(bits, dtype=np.uint8)


def _pack_free_text(text: str) -> np.ndarray:
    t = text[:13].rjust(13)
    v = 0
    for ch in t:
        v = v * 42 + (_FREE.index(ch) if ch in _FREE else 0)
    bits = bits_from_int(v, 71) + [0, 0, 0] + bits_from_int(0, 3)
    return np.array(bits, dtype=np.uint8)


def unpack77(bits: np.ndarray) -> Message:
    bits = np.asarray(bits).astype(np.uint8)
    assert bits.shape == (77,)
    i3 = int_from_bits(bits[74:77])
    if i3 == 1 or i3 == 2:
        c28a = int_from_bits(bits[0:28])
        c28b = int_from_bits(bits[29:57])
        rr = int(bits[58])
        g15 = int_from_bits(bits[59:74])
        w1 = unpack_call28(c28a)
        w2 = unpack_call28(c28b)
        # record heard calls so later hashed references resolve
        for w in (w1, w2):
            if _is_standard_call(w):
                register_call(w)
        w3 = unpack_grid15(g15, rr)
        text = " ".join(w for w in (w1, w2, w3) if w)
        msg = Message(text=text, call1=w1, call2=w2, i3=i3)
        msg.is_cq = w1.startswith("CQ")
        if g15 < MAXGRID4:
            msg.grid = w3[-4:]
        elif g15 >= MAXGRID4 + 4:
            msg.report = w3
        return msg
    if i3 == 4:
        return _unpack_nonstandard(bits)
    if i3 == 0:
        v = int_from_bits(bits[0:71])
        chars = []
        for _ in range(13):
            chars.append(_FREE[v % 42])
            v //= 42
        text = "".join(reversed(chars)).strip()
        return Message(text=text, i3=0, is_free_text=True)
    return Message(text=f"<unsupported i3={i3}>", i3=i3, is_free_text=True)
