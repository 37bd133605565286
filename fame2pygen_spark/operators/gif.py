"""GIF87a/GIF89a codec — pure stdlib + numpy, no external image
library (the PNG/JPEG/VP8L discipline applied to the remaining
ubiquitous web still/animation format; reference parity: the
reference pipeline shells out to a codec library for ALL image
formats — here the codec is the operator).

Implemented surface:

* decoder (:func:`decode_gif_frames`): full GIF-LZW (variable code
  width 3–12 bits, CLEAR/EOI, the KwKwK self-reference case),
  global + local color tables, interlaced row order (the 8/8/4/2
  pass schedule), GIF89a graphic-control extensions (per-frame
  delay, transparency index, disposal 0/1 keep · 2 restore-background
  · 3 restore-previous), frames composited onto the logical-screen
  canvas at their (left, top) offsets — the animated-WebP
  compositing semantics, GIF flavor.  Returns the stack of RGBA
  canvases a viewer would see.
* encoder (:func:`encode_gif`): fixture writer emitting valid
  GIF89a — palette-indexed frames, optional interlace, per-frame
  delay/disposal/transparency, LZW data in the always-valid
  CLEAR-before-literal form (code width pinned at min+1; every
  decoder path above is exercised by bit-exact round-trips).

Interop caveat (same epistemic position as the WebP/JPEG modules):
implemented from the public specification and round-tripped against
this module's own encoder; no external GIF codec exists in this
container to differentially test real-world streams.
"""

from __future__ import annotations

_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace (start, step)


class _LzwReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            if p >> 3 >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos += n
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list:
    """GIF-LZW → index list (exactly *n_pixels* entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LzwReader(data)
    out: list = []

    def reset():
        return (
            {i: [i] for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: list | None = None
    while len(out) < n_pixels:
        code = br.bits(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF frame ended short of its pixel count")
    return out[:n_pixels]


def _sub_blocks(payload: bytes, pos: int):
    """Concatenate data sub-blocks starting at *pos*; returns
    (bytes, position after the block terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def decode_gif_frames(payload: bytes):
    """GIF payload → ``(n_frames, canvas_h, canvas_w, 4)`` uint8 RGBA
    composited canvases (disposal/transparency applied per spec)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    cw = int.from_bytes(payload[6:8], "little")
    ch = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        bg = (int(gct[bg_index][0]), int(gct[bg_index][1]),
              int(gct[bg_index][2]), 255)
    else:
        bg = (0, 0, 0, 0)
    canvas = np.empty((ch, cw, 4), dtype=np.uint8)
    canvas[:, :] = bg

    frames = []
    delay_ms, transparent, disposal = 0, None, 0
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9:  # graphic control
                blk, npos = _sub_blocks(payload, pos + 2)
                if len(blk) < 4:
                    raise ValueError("truncated GIF graphic control")
                flags = blk[0]
                disposal = (flags >> 2) & 7
                delay_ms = int.from_bytes(blk[1:3], "little") * 10
                transparent = blk[3] if flags & 1 else None
                pos = npos
            else:  # comment / plain text / application: skip
                _, pos = _sub_blocks(payload, pos + 2)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            ct = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        interlaced = bool(ipacked & 0x40)
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.asarray(
            _lzw_decode(data, min_code, fw * fh), dtype=np.int64
        )
        if interlaced:
            rows = idx.reshape(fh, fw)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _PASSES:
                for r in range(start, fh, step):
                    out_rows[r] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        rgba = np.empty((fh, fw, 4), dtype=np.uint8)
        rgba[:, :, :3] = ct[idx].reshape(fh, fw, 3)
        rgba[:, :, 3] = 255
        if transparent is not None:
            rgba[:, :, 3] = np.where(
                idx.reshape(fh, fw) == transparent, 0, 255
            )
        if top + fh > ch or left + fw > cw:
            raise ValueError("GIF frame exceeds logical screen")
        region = canvas[top : top + fh, left : left + fw]
        saved = region.copy() if disposal == 3 else None
        opaque = rgba[:, :, 3] == 255
        region[opaque] = rgba[opaque]
        frames.append(canvas.copy())
        if disposal == 2:
            region[:, :] = bg
        elif disposal == 3 and saved is not None:
            region[:] = saved
        delay_ms, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("no image frames in GIF payload")
    import numpy as np

    return np.stack(frames, axis=0)


def _lzw_encode_literal(indices, min_code_size: int) -> bytes:
    """Always-valid GIF-LZW: CLEAR before every literal pins the code
    width at ``min_code_size + 1`` (the classic 'uncompressed GIF'
    construction — larger output, spec-exact input for the decoder's
    table-reset path)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in indices:
        put(clear)
        put(int(v))
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames,
    palette,
    *,
    canvas: tuple | None = None,
    offsets: list | None = None,
    delays_ms: list | None = None,
    disposals: list | None = None,
    transparent: int | None = None,
    interlace: bool = False,
    bg_index: int = 0,
) -> bytes:
    """Fixture/export GIF89a writer over palette-INDEX frames.

    *frames*: list of 2-D integer index arrays; *palette*: (n, 3)
    RGB rows, n a power of two ≥ 2.  Per-frame *offsets* (left, top),
    *delays_ms* (rounded down to centiseconds), *disposals* (0–3) and
    a shared *transparent* index mirror the decoder's surface."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    if n & (n - 1) or n < 2:
        raise ValueError("palette size must be a power of two >= 2")
    depth = max(2, n).bit_length() - 1
    min_code = max(2, depth)
    arrs = [np.asarray(f, dtype=np.int64) for f in frames]
    if not arrs:
        raise ValueError("need at least one frame")
    cw, chh = canvas if canvas is not None else (
        arrs[0].shape[1], arrs[0].shape[0]
    )
    offs = offsets if offsets is not None else [(0, 0)] * len(arrs)
    dls = delays_ms if delays_ms is not None else [0] * len(arrs)
    dsp = disposals if disposals is not None else [0] * len(arrs)

    out = bytearray(b"GIF89a")
    out += cw.to_bytes(2, "little") + chh.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), bg_index, 0])
    out += pal.tobytes()
    for arr, (left, top), delay, disp in zip(arrs, offs, dls, dsp):
        fh, fw = arr.shape
        flags = ((disp & 7) << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags])
        out += (delay // 10).to_bytes(2, "little")
        out += bytes([transparent if transparent is not None else 0, 0])
        out += bytes([0x2C])
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        idx = arr.reshape(fh, fw)
        if interlace:
            rows = []
            for start, step in _PASSES:
                for r in range(start, fh, step):
                    rows.append(idx[r])
            idx = np.stack(rows, axis=0)
        out += bytes([min_code])
        data = _lzw_encode_literal(idx.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
