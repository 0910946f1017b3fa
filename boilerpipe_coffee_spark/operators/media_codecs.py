"""Minimal pure-python media codecs for the multimodal operators.

Real formats, implemented from the public specs so any external tool
can read the synthesized payloads and these parsers can read minimal
real-world files:

- PNG (RFC 2083): 8-bit grayscale, zlib IDAT, CRC-verified chunks,
  scanline filters None/Sub/Up on read (the writer emits None).
- WAV (RIFF): 16-bit PCM mono.
- GIF89a: multi-frame, global 256-gray palette, real LZW encode and
  decode with code-width growth and 4096-entry clear handling --
  used as the "video" container so frame sampling decodes real frames.

The container lacks PIL/ffmpeg (environment limit); these replace the
r1-r3 decode stubs with working codecs behind the same interface.
Parsers raise ValueError on corrupt/unsupported input -- callers
quarantine.  The ``_parser`` decorator enforces that contract even for
low-level explosions (struct.error / IndexError from truncated
buffers), so a reader can never leak a non-ValueError into a Spark
task and fail the whole job.
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parser(fn):
    """Normalize low-level parse failures to the module's documented
    ValueError contract: truncated buffers surface as struct.error or
    IndexError from fixed-size unpacks/indexing deep inside a reader,
    and any such escape would fail a whole Spark job instead of
    quarantining one row (ADVICE r4).  ValueError passes through
    untouched; TypeError is deliberately NOT converted -- a None
    payload is a caller bug the caller must guard (multimodal does)."""

    @functools.wraps(fn)
    def wrap(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except (struct.error, IndexError) as e:
            raise ValueError(
                f"{fn.__name__}: truncated or corrupt input "
                f"({type(e).__name__}: {e})"
            ) from e

    return wrap


# ------------------------------------------------------------------ #
# PNG (8-bit grayscale)                                               #
# ------------------------------------------------------------------ #

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale PNG; ``pixels`` is width*height bytes, row-major."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


@_parser
def read_png(buf: bytes) -> dict:
    """Parse an 8-bit grayscale PNG -> {width, height, pixels}."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype) != (8, 0):
                raise ValueError(
                    f"unsupported PNG depth/colortype {depth}/{ctype}"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT corrupt: {e}") from e
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("PNG scanline size mismatch")
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * stride]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=width, offset=y * stride + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"PNG filter {ftype} unsupported")
        out[y] = row
        prev = row
    return {"width": width, "height": height, "pixels": out.tobytes()}


# ------------------------------------------------------------------ #
# WAV (16-bit PCM mono)                                               #
# ------------------------------------------------------------------ #

def write_wav(rate: int, samples: np.ndarray) -> bytes:
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_parser
def read_wav(buf: bytes) -> dict:
    """Parse a PCM WAV -> {rate, n_samples, duration_ms, samples}."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated WAV chunk")
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            afmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (afmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV format {afmt}/{channels}ch/{bits}bit"
                )
        elif tag == b"data":
            data = chunk
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return {
        "rate": rate,
        "n_samples": len(samples),
        "duration_ms": round(len(samples) * 1000 / rate),
        "samples": samples,
    }


# ------------------------------------------------------------------ #
# GIF89a (grayscale palette, multi-frame)                             #
# ------------------------------------------------------------------ #

_GIF_MIN_CODE = 8  # 256-color palette


def _lzw_encode(data: bytes, min_code_size: int = _GIF_MIN_CODE) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = _GIF_MIN_CODE) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    big = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    pos = 0
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while pos + code_size <= total_bits:
        code = (big >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code out of range")
            table.append(prev + entry[:1])
            # the decoder adds entries one code LATER than the encoder
            # (the first code after a clear adds nothing), so it must
            # widen one entry earlier to stay bit-aligned
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    return bytes(out)


def write_gif(
    width: int,
    height: int,
    frames: list[bytes],
    delays_cs: list[int],
) -> bytes:
    """Grayscale multi-frame GIF89a; each frame is width*height palette
    (== gray-level) bytes; one delay (centiseconds) per frame."""
    if len(frames) != len(delays_cs) or not frames:
        raise ValueError("frames/delays mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT, 8-bit, 256 entries; bg 0; aspect 0
    for i in range(256):
        out += bytes([i, i, i])
    for frame, delay in zip(frames, delays_cs):
        if len(frame) != width * height:
            raise ValueError("frame size mismatch")
        out += b"\x21\xf9\x04"  # graphic control extension
        out += bytes([0x00]) + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x00, _GIF_MIN_CODE])
        out += _sub_blocks(_lzw_encode(frame))
    out += b"\x3b"
    return bytes(out)


@_parser
def read_gif(buf: bytes) -> dict:
    """Parse a GIF89a/87a -> {width, height, frames, delays_cs,
    duration_ms}.  Full-canvas, non-interlaced frames (what write_gif
    emits); local color tables are skipped over, interlace rejected."""
    if buf[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", buf[6:10])
    packed = buf[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames: list[bytes] = []
    delays: list[int] = []
    delay = 0
    while pos < len(buf):
        marker = buf[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9 and buf[pos] >= 4:
                delay = struct.unpack("<H", buf[pos + 2 : pos + 4])[0]
            while True:  # skip sub-blocks
                size = buf[pos]
                pos += 1 + size
                if size == 0:
                    break
        elif marker == 0x2C:  # image descriptor
            x, y, w, h = struct.unpack("<HHHH", buf[pos : pos + 8])
            fpacked = buf[pos + 8]
            pos += 9
            if fpacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while True:
                size = buf[pos]
                pos += 1
                data += buf[pos : pos + size]
                pos += size
                if size == 0:
                    break
            pixels = _lzw_decode(bytes(data), min_code)
            if (x, y, w, h) != (0, 0, width, height):
                raise ValueError("partial-canvas GIF frame unsupported")
            if len(pixels) < w * h:
                raise ValueError("GIF frame pixel shortfall")
            frames.append(pixels[: w * h])
            delays.append(delay)
            delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{marker:02x}")
    if not frames:
        raise ValueError("GIF contains no frames")
    return {
        "width": width,
        "height": height,
        "frames": frames,
        "delays_cs": delays,
        "duration_ms": sum(delays) * 10,
    }


# ------------------------------------------------------------------ #
# PDF (minimal text-page documents)                                   #
# ------------------------------------------------------------------ #
# Writer emits a small but valid PDF 1.4: catalog -> page tree ->
# one FlateDecode content stream per page of Tj text operators, plus
# a correct xref table.  Reader parses the object graph (page order
# from the /Kids array), inflates streams, and extracts text from
# BT..ET blocks' Tj/TJ operators -- enough for the layout-parse
# ingestion path over machine-generated text PDFs; scanned/encrypted
# PDFs raise ValueError and quarantine upstream.

import re as _re


def _pdf_escape(s: str) -> bytes:
    out = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    out = out.replace("\r", "\\r").replace("\n", "\\n").replace("\t", "\\t")
    return out.encode("latin-1", errors="replace")


_PDF_UNESCAPE = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _PDF_UNESCAPE:
                out += _PDF_UNESCAPE[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def write_pdf(
    pages: list[str], compress: bool = True, object_streams: bool = False
) -> bytes:
    """One text page per entry; each page's text becomes Tj lines in a
    content stream -- FlateDecode by default, raw when
    ``compress=False`` (real-world corpora mix both; the reader
    handles either, and the adversarial tests exercise marker bytes
    inside both kinds).

    ``object_streams=True`` emits a PDF 1.5 file: every dictionary
    object (catalog, page tree, pages, font) rides compressed inside a
    /Type /ObjStm container, and the cross-reference table is a
    /Type /XRef stream (binary /W [1 4 1] rows, type-2 entries
    pointing into the ObjStm) -- the layout virtually every modern PDF
    producer emits, and the one naive sequential parsers cannot see
    into."""
    if not pages:
        raise ValueError("PDF needs at least one page")
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {page_num + 1} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        lines = text.split("\n") or [""]
        ops = bytearray(b"BT /F1 11 Tf 36 756 Td 13 TL\n")
        for k, line in enumerate(lines):
            if k:
                ops += b"T*\n"
            ops += b"(" + _pdf_escape(line) + b") Tj\n"
        ops += b"ET"
        if compress:
            data = zlib.compress(bytes(ops), 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = bytes(ops)
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    if not object_streams:
        buf = bytearray(b"%PDF-1.4\n")
        offsets = [0]
        for num, body in enumerate(objs, start=1):
            offsets.append(len(buf))
            buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(buf)
        buf += f"xref\n0 {len(objs) + 1}\n".encode()
        buf += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            buf += f"{off:010d} 00000 n \n".encode()
        buf += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(buf)

    # ---- PDF 1.5 layout: ObjStm + xref stream -------------------- #
    # stream objects (page contents) cannot live inside an ObjStm per
    # spec; every dictionary object becomes a type-2 member
    stream_nums = {4 + 2 * i for i in range(n_pages)}
    member_nums = [
        n for n in range(1, len(objs) + 1) if n not in stream_nums
    ]
    s_num = len(objs) + 1  # the ObjStm container
    x_num = s_num + 1  # the xref stream
    header_parts, bodies, off = [], [], 0
    for n in member_nums:
        body = objs[n - 1]
        header_parts.append(f"{n} {off}")
        bodies.append(body + b"\n")
        off += len(body) + 1
    hdr = (" ".join(header_parts) + "\n").encode()
    content = hdr + b"".join(bodies)
    sdata = zlib.compress(content, 6) if compress else content
    filt = " /Filter /FlateDecode" if compress else ""
    objstm_obj = (
        f"<< /Type /ObjStm /N {len(member_nums)} /First {len(hdr)} "
        f"/Length {len(sdata)}{filt} >>".encode()
        + b"\nstream\n" + sdata + b"\nendstream"
    )

    buf = bytearray(b"%PDF-1.5\n")
    offsets2: dict[int, int] = {}
    for n in sorted(stream_nums):
        offsets2[n] = len(buf)
        buf += f"{n} 0 obj\n".encode() + objs[n - 1] + b"\nendobj\n"
    offsets2[s_num] = len(buf)
    buf += f"{s_num} 0 obj\n".encode() + objstm_obj + b"\nendobj\n"
    xref_at = len(buf)
    size = x_num + 1
    rows = bytearray()
    for n in range(size):
        if n == 0:
            t, f2, f3 = 0, 0, 0  # the free-list head
        elif n == x_num:
            t, f2, f3 = 1, xref_at, 0
        elif n in offsets2:
            t, f2, f3 = 1, offsets2[n], 0
        else:
            t, f2, f3 = 2, s_num, member_nums.index(n)
        rows += struct.pack(">BIB", t, f2, f3)
    xref_obj = (
        f"<< /Type /XRef /Size {size} /W [1 4 1] /Root 1 0 R "
        f"/Length {len(rows)} >>".encode()
        + b"\nstream\n" + bytes(rows) + b"\nendstream"
    )
    buf += f"{x_num} 0 obj\n".encode() + xref_obj + b"\nendobj\n"
    buf += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(buf)


_OBJ_HDR_RE = _re.compile(rb"(\d+)\s+0\s+obj\b")
_STREAM_START_RE = _re.compile(rb"stream\r?\n")
_LENGTH_RE = _re.compile(rb"/Length\s+(\d+)\b")
_KIDS_RE = _re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_REF_RE = _re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = _re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_TJ_RE = _re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TJ_ARR_RE = _re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", _re.S)
_STR_RE = _re.compile(rb"\(((?:[^()\\]|\\.)*)\)")


def _parse_objects(buf: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object walk -> {num: (dict_bytes, stream_bytes|None)}.
    Stream payloads are sliced by their integer /Length (never by
    searching for 'endstream', which compressed bytes can contain by
    chance -- the classic naive-parser corruption)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_HDR_RE.search(buf, pos)
        if m is None:
            break
        num = int(m.group(1))
        p = m.end()
        end = buf.find(b"endobj", p)
        if end == -1:
            raise ValueError("unterminated PDF object")
        sm = _STREAM_START_RE.search(buf, p, end + 6)
        if sm is not None and sm.start() < end:
            head = buf[p : sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm is None:
                raise ValueError("PDF stream without integer /Length")
            length = int(lm.group(1))
            data = buf[sm.end() : sm.end() + length]
            if len(data) != length:
                raise ValueError("truncated PDF stream")
            objs[num] = (head, data)
            # PDF 1.5 object streams: dictionary objects ride inside
            # this container -- expand them NOW, in file order, so a
            # later (incremental-update) definition still overrides an
            # earlier one via plain dict assignment
            if _re.search(rb"/Type\s*/ObjStm\b", head):
                _expand_objstm(head, data, objs)
            end = buf.find(b"endobj", sm.end() + length)
            if end == -1:
                raise ValueError("unterminated PDF stream object")
        else:
            objs[num] = (buf[p:end], None)
        pos = end + 6
    return objs


def _expand_objstm(
    head: bytes, data: bytes, objs: dict[int, tuple[bytes, bytes | None]]
) -> None:
    """Expand a /Type /ObjStm container into ``objs``: decompressed
    content starts with /N whitespace-separated (objnum, offset) pairs;
    member bodies begin at /First.  Members are dictionary objects only
    (the spec forbids streams inside an ObjStm), so each lands as a
    (body, None) entry.  Any structural inconsistency raises ValueError
    -- a silently-partial expansion would drop pages undetectably."""
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error as e:
            raise ValueError(f"ObjStm inflate failed: {e}") from e
    nm = _re.search(rb"/N\s+(\d+)\b", head)
    fm = _re.search(rb"/First\s+(\d+)\b", head)
    if nm is None or fm is None:
        raise ValueError("ObjStm missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    if first > len(data):
        raise ValueError("ObjStm /First beyond stream data")
    header = data[:first].split()
    if len(header) < 2 * n:
        raise ValueError("ObjStm pair header truncated")
    try:
        ints = [int(x) for x in header[: 2 * n]]
    except ValueError as e:
        raise ValueError("ObjStm pair header not integers") from e
    nums, offs = ints[0::2], ints[1::2]
    body_len = len(data) - first
    for i, (num, off) in enumerate(zip(nums, offs)):
        end = offs[i + 1] if i + 1 < n else body_len
        if not (0 <= off <= end <= body_len):
            raise ValueError("ObjStm member offsets out of range")
        objs[num] = (data[first + off : first + end], None)


def _stream_text(head: bytes, data: bytes | None) -> str:
    if data is None:
        return ""
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error as e:
            raise ValueError(f"PDF stream inflate failed: {e}") from e
    parts: list[str] = []
    for sm in _TJ_RE.finditer(data):
        parts.append(_pdf_unescape(sm.group(1)))
        parts.append("\n")
    for am in _TJ_ARR_RE.finditer(data):
        for sm in _STR_RE.finditer(am.group(1)):
            parts.append(_pdf_unescape(sm.group(1)))
        parts.append("\n")
    text = "".join(parts)
    return text[:-1] if text.endswith("\n") else text


@_parser
def read_pdf(buf: bytes) -> dict:
    """Parse a text PDF -> {n_pages, pages: [text, ...]} in page-tree
    order.  Our writer uses one Tj per source line with T* line
    advances, so page text round-trips exactly."""
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    if b"/Encrypt" in buf:
        raise ValueError("encrypted PDF unsupported")
    objs = _parse_objects(buf)
    # PDF 1.5 object-stream files are SUPPORTED (round 5): the walk
    # expands /ObjStm containers inline (see _expand_objstm), so
    # type-2 xref entries resolve without reading the xref stream at
    # all; /Type /XRef objects are just binary streams the walk skips.
    # Malformed ObjStm structure raises ValueError -> quarantine.
    if not objs:
        raise ValueError("PDF contains no objects")
    kids: list[int] = []
    for head, _ in objs.values():
        if b"/Type /Pages" in head or b"/Type/Pages" in head:
            km = _KIDS_RE.search(head)
            if km:
                kids = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
            break
    if not kids:  # single implicit page tree: collect /Type /Page objs
        kids = sorted(
            n for n, (h, _) in objs.items()
            if _re.search(rb"/Type\s*/Page\b", h)
        )
    if not kids:
        raise ValueError("PDF has no pages")
    pages = []
    for num in kids:
        entry = objs.get(num)
        if entry is None:
            raise ValueError(f"PDF page object {num} missing")
        cm = _CONTENTS_RE.search(entry[0])
        if cm is None:
            pages.append("")
            continue
        content = objs.get(int(cm.group(1)))
        if content is None:
            raise ValueError("PDF content stream missing")
        pages.append(_stream_text(*content))
    return {"n_pages": len(pages), "pages": pages}


# ------------------------------------------------------------------ #
# JPEG (baseline DCT, non-progressive, 8-bit grayscale)               #
# ------------------------------------------------------------------ #
# Implemented from the public ITU-T T.81 spec: standard Annex K luma
# quantization + Huffman tables, JFIF APP0, SOF0 single-component
# scan.  Same scope discipline as the PNG codec above (8-bit
# grayscale only): real-world color/progressive JPEGs raise
# ValueError and quarantine rather than silently mis-decoding.

JPEG_SOI = b"\xff\xd8"

# Annex K.1 luminance quantization table (natural row-major order)
_JPEG_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# zigzag scan: _JPEG_ZIGZAG[k] = natural index of the k-th coefficient
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 luminance DC table: BITS (codes per length 1..16), HUFFVAL
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
# Annex K.3 luminance AC table
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, len)."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {
        (ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()
    }


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    t *= np.sqrt(2.0 / 8.0)
    t[0] *= np.sqrt(0.5)
    return t


_DCT_T = _dct_matrix()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG scan data exhausted")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf) or self.buf[self.pos] != 0x00:
                    raise ValueError("unexpected marker in JPEG scan")
                self.pos += 1  # skip stuffed zero
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _magnitude(v: int) -> "tuple[int, int]":
    """(size, appended bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def write_jpeg(width: int, height: int, pixels: bytes) -> bytes:
    """Baseline-DCT grayscale JFIF; ``pixels`` is width*height bytes,
    row-major.  Lossy: quantized with the Annex K luma table."""
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"bad JPEG dimensions {width}x{height}")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = -(-width // 8), -(-height // 8)
    # edge-replicate pad to full blocks (keeps edge gradients mild)
    pad = np.pad(
        img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    ).astype(np.float64) - 128.0

    q = _JPEG_QUANT.reshape(8, 8).astype(np.float64)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _DCT_T @ blk @ _DCT_T.T
            zz = np.rint(coef / q).astype(np.int64).ravel()[_JPEG_ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s, bits_v = _magnitude(diff)
            code, ln = dc_codes[s]
            w.put(code, ln)
            if s:
                w.put(bits_v, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                s, bits_v = _magnitude(v)
                code, ln = ac_codes[(run << 4) | s]
                w.put(code, ln)
                w.put(bits_v, s)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                w.put(code, ln)

    dqt = bytes([0]) + bytes(int(v) for v in _JPEG_QUANT[_JPEG_ZIGZAG])
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        JPEG_SOI
        + _jpeg_segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _jpeg_segment(0xDB, dqt)
        + _jpeg_segment(0xC0, sof)
        + _jpeg_segment(0xC4, dht)
        + _jpeg_segment(0xDA, sos)
        + w.flush()
        + b"\xff\xd9"
    )


@_parser
def read_jpeg(buf: bytes) -> dict:
    """Parse a baseline-DCT grayscale JPEG -> {width, height, pixels}.

    Progressive (SOF2), extended/arithmetic/hierarchical frames,
    multi-component scans, and restart intervals raise ValueError --
    the declared-scope quarantine contract, never a wrong decode."""
    if buf[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], dict]" = {}
    width = height = None
    dc_id = ac_id = qt_id = None
    scan = None
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        seg = buf[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                if len(tbl) != 64:
                    raise ValueError("short quant table")
                nat = np.empty(64, dtype=np.int32)
                nat[_JPEG_ZIGZAG] = tbl
                quant[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("short Huffman table")
                huff[(tc, th)] = _huff_lookup(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if depth != 8:
                raise ValueError(f"JPEG depth {depth} unsupported")
            if ncomp != 1:
                raise ValueError(
                    f"{ncomp}-component JPEG unsupported (grayscale only)"
                )
            cid, sampling, qt_id = seg[6], seg[7], seg[8]
            if sampling != 0x11:
                raise ValueError("subsampled JPEG unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame SOF{marker - 0xC0} unsupported"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
            if ri:
                raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if seg[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            scan = buf[pos + 2 + seglen :]
            break
        pos += 2 + seglen
    if width is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if qt_id not in quant:
        raise ValueError(f"JPEG quant table {qt_id} missing")
    if (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("JPEG Huffman tables missing")
    dc_tbl, ac_tbl = huff[(0, dc_id)], huff[(1, ac_id)]
    q = quant[qt_id].astype(np.float64)

    def read_symbol(r: _BitReader, tbl: dict) -> int:
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | r.bit()
            ln += 1
            sym = tbl.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    bw, bh = -(-width // 8), -(-height // 8)
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    r = _BitReader(scan)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.float64)
            s = read_symbol(r, dc_tbl)
            if s > 11:
                raise ValueError(f"JPEG DC size {s} out of range")
            diff = extend(r.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = read_symbol(r, ac_tbl)
                if sym == 0x00:  # EOB
                    break
                run, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if run != 15:
                        raise ValueError(f"bad JPEG AC symbol {sym:#x}")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("JPEG AC coefficient overrun")
                zz[k] = extend(r.bits(s), s)
                k += 1
            nat = np.zeros(64, dtype=np.float64)
            nat[_JPEG_ZIGZAG] = zz
            coef = nat.reshape(8, 8) * q
            blk = _DCT_T.T @ coef @ _DCT_T
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    img = np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "pixels": img[:height, :width].tobytes(),
    }
