"""Unit tests for the pure-python media codecs (PNG / WAV / GIF89a)
and the resize arithmetic -- no Spark needed."""

import numpy as np
import pytest

from boilerpipe_coffee_spark.operators import media_codecs as mc
from boilerpipe_coffee_spark.operators.multimodal import _box_resize


RNG = np.random.RandomState(1234)


@pytest.mark.parametrize("w,h", [(1, 1), (8, 63), (63, 8), (40, 40)])
def test_png_round_trip(w, h):
    pix = RNG.randint(0, 256, w * h).astype(np.uint8).tobytes()
    d = mc.read_png(mc.write_png(w, h, pix))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == pix


def test_png_rejects_corruption():
    buf = bytearray(mc.write_png(4, 4, bytes(range(16))))
    with pytest.raises(ValueError):
        mc.read_png(b"notapng" + bytes(buf))
    buf[20] ^= 0xFF  # flip a bit inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        mc.read_png(bytes(buf))


def test_png_sub_and_up_filters():
    # hand-build a PNG using filters 1 (Sub) and 2 (Up): read_png must
    # reconstruct -- minimal real-world-file compatibility
    import struct
    import zlib

    width, height = 4, 2
    row0 = bytes([10, 20, 30, 40])
    row1 = bytes([15, 25, 35, 45])
    # filter 1: first byte raw, rest delta vs left
    f0 = bytes([1, 10, 10, 10, 10])
    # filter 2: delta vs row above
    f1 = bytes([2, 5, 5, 5, 5])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    buf = (
        mc.PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(f0 + f1))
        + mc._png_chunk(b"IEND", b"")
    )
    d = mc.read_png(buf)
    assert d["pixels"] == row0 + row1


def test_wav_round_trip():
    s = RNG.randint(-32768, 32768, 4321).astype(np.int16)
    d = mc.read_wav(mc.write_wav(8000, s))
    assert d["rate"] == 8000
    assert d["n_samples"] == 4321
    assert d["duration_ms"] == round(4321 * 1000 / 8000)
    assert np.array_equal(d["samples"], s)


def test_wav_rejects_bad_formats():
    with pytest.raises(ValueError):
        mc.read_wav(b"RIFFxxxxNOPE")
    good = bytearray(mc.write_wav(8000, np.zeros(10, dtype=np.int16)))
    good[22] = 2  # stereo
    with pytest.raises(ValueError, match="unsupported WAV"):
        mc.read_wav(bytes(good))


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        bytes(range(256)),
        b"abcabcabcabd" * 3000,  # deep dictionary chains
        bytes(50000),  # pathological all-zero
        RNG.randint(0, 256, 60000).astype(np.uint8).tobytes(),  # > 4096 codes
    ],
    ids=["empty", "one", "alphabet", "repetitive", "zeros", "random60k"],
)
def test_lzw_round_trip(data):
    assert mc._lzw_decode(mc._lzw_encode(data)) == data


def test_gif_round_trip_and_duration():
    frames = [
        RNG.randint(0, 256, 30 * 20).astype(np.uint8).tobytes()
        for _ in range(4)
    ]
    d = mc.read_gif(mc.write_gif(30, 20, frames, [12, 25, 7, 40]))
    assert (d["width"], d["height"]) == (30, 20)
    assert d["frames"] == frames
    assert d["delays_cs"] == [12, 25, 7, 40]
    assert d["duration_ms"] == 840


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        mc.read_gif(b"JIF89a" + bytes(20))


def test_box_resize_exact_means():
    # 4x4 -> 2x2: each output pixel is the mean of a 2x2 block
    img = np.array(
        [
            [0, 4, 8, 12],
            [2, 6, 10, 14],
            [100, 104, 108, 112],
            [102, 106, 110, 114],
        ],
        dtype=np.uint8,
    )
    out = _box_resize(img, 2, 2)
    assert out.tolist() == [[3, 11], [103, 111]]


def test_box_resize_uneven_blocks():
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    out = _box_resize(img, 3, 2)
    assert out.shape == (2, 3)
    # block boundaries: rows [0:2],[2:5]; cols [0:2],[2:4],[4:7]
    expect = np.array(
        [
            [img[0:2, 0:2].mean(), img[0:2, 2:4].mean(), img[0:2, 4:7].mean()],
            [img[2:5, 0:2].mean(), img[2:5, 2:4].mean(), img[2:5, 4:7].mean()],
        ]
    )
    assert np.abs(out.astype(float) - expect).max() <= 0.5


def test_synth_payload_is_deterministic_and_real():
    from boilerpipe_coffee_spark.operators.multimodal import synth_payload

    for kind, reader in [
        ("image", mc.read_png),
        ("audio", mc.read_wav),
        ("video", mc.read_gif),
    ]:
        p1 = synth_payload("some/ref.bin", kind)
        p2 = synth_payload("some/ref.bin", kind)
        assert p1 == p2
        reader(p1)  # parses cleanly


def test_pdf_round_trip_and_escaping():
    pages = [
        "hello (world) \\ with\nnewline and )unbalanced(",
        "<p>page two &amp; html</p>",
        "",
        "tabs\there",
    ]
    d = mc.read_pdf(mc.write_pdf(pages))
    assert d["n_pages"] == 4
    assert d["pages"] == pages


def test_pdf_survives_marker_bytes_in_streams():
    """Stream payloads can contain 'endobj'/'endstream'/'N 0 obj'
    bytes (by chance when compressed, or literally in uncompressed
    streams); the /Length-driven walk must not be fooled -- the
    classic naive-regex-parser corruption.  Deterministic adversarial
    case: an UNCOMPRESSED content stream whose text contains every
    marker."""
    text = "x endobj endstream 2 0 obj stream y"
    ops = b"BT /F1 11 Tf 36 756 Td 13 TL\n(" + mc._pdf_escape(text) + b") Tj\nET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(ops)).encode() + b" >>\nstream\n"
        + ops + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objs, start=1):
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    d = mc.read_pdf(bytes(buf))
    assert d["pages"] == [text]


def test_pdf_rejects_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mc.read_pdf(b"not a pdf at all")
    good = bytearray(mc.write_pdf(["some page text here"]))
    with _pytest.raises(ValueError):
        mc.read_pdf(bytes(good[: len(good) // 2]))  # truncated stream


def test_readers_raise_valueerror_on_truncation():
    """Truncated buffers used to surface struct.error/IndexError from
    inside the readers (ADVICE r4) -- the _parser decorator must
    normalize EVERY such explosion to the documented ValueError so the
    Spark quarantine path catches it."""
    import pytest as _pytest

    gif = mc.write_gif(128, 1, [bytes(range(128))], [100])
    wav = mc.write_wav(8000, __import__("numpy").zeros(64, dtype="<i2"))
    png = mc.write_png(4, 4, bytes(16))
    pdf = mc.write_pdf(["page"])
    for buf in (gif, wav, png, pdf):
        for cut in (7, 10, 13, len(buf) // 2, len(buf) - 3):
            for reader in (mc.read_gif, mc.read_wav, mc.read_png, mc.read_pdf):
                try:
                    reader(buf[:cut])
                except ValueError:
                    pass  # the contract
                except Exception as e:  # noqa: BLE001
                    _pytest.fail(
                        f"{reader.__name__} leaked {type(e).__name__} "
                        f"on {len(buf[:cut])}-byte input: {e}"
                    )


def test_pdf_uncompressed_round_trip():
    pages = ["raw stream page", "with (escapes) \\ too"]
    buf = mc.write_pdf(pages, compress=False)
    assert b"/FlateDecode" not in buf
    assert mc.read_pdf(buf)["pages"] == pages
    # and mixed corpora: compressed next to raw must both parse
    assert mc.read_pdf(mc.write_pdf(pages))["pages"] == pages


def test_pdf_marker_bytes_in_compressed_and_raw_streams():
    """Adversarial corpus for the /Length-driven walk: BOTH stream
    kinds carrying marker bytes.  The raw content stream literally
    contains endobj/endstream/N 0 obj; the compressed page is
    FlateDecode whose DEFLATE bytes are opaque binary (any marker can
    occur by chance at corpus scale -- the committed case pins the
    slicing, not the luck)."""
    marker_text = "x endstream endobj 3 0 obj stream y"
    raw = mc.write_pdf([marker_text, "second page"], compress=False)
    assert b"endstream endobj" in raw  # markers really are in-stream
    assert mc.read_pdf(raw)["pages"] == [marker_text, "second page"]
    comp = mc.write_pdf([marker_text, "second page"], compress=True)
    assert mc.read_pdf(comp)["pages"] == [marker_text, "second page"]


def test_pdf_object_streams_round_trip():
    """PDF 1.5 files (the modern default layout): dictionary objects
    compressed inside a /Type /ObjStm container, binary /Type /XRef
    stream with type-2 entries.  The walk must expand the container
    and round-trip page text exactly, for compressed and raw ObjStm
    content, including marker bytes inside the content streams."""
    pages = ["modern layout page", "x endstream endobj 3 0 obj y", ""]
    for compress in (True, False):
        buf = mc.write_pdf(pages, compress=compress, object_streams=True)
        assert b"/ObjStm" in buf and b"/XRef" in buf
        # the page-tree dicts really are hidden inside the container
        assert b"2 0 obj\n<< /Type /Pages" not in buf
        d = mc.read_pdf(buf)
        assert d["pages"] == pages, compress


def test_pdf_malformed_objstm_quarantines():
    """A structurally-broken ObjStm must raise the quarantine
    ValueError, never silently drop the pages it hides or leak a
    low-level exception."""
    import pytest as _pytest

    good = mc.write_pdf(["only page"], object_streams=True)
    # corrupt the compressed container body: inflate fails
    import re as _re2

    m = _re2.search(rb"/Type /ObjStm[^>]*>>\nstream\n", good)
    assert m
    bad = bytearray(good)
    bad[m.end() : m.end() + 4] = b"\x00\x00\x00\x00"
    with _pytest.raises(ValueError):
        mc.read_pdf(bytes(bad))
    # raw container with a lying /N: pair header too short
    raw = mc.write_pdf(["only page"], compress=False, object_streams=True)
    with _pytest.raises(ValueError, match="ObjStm"):
        mc.read_pdf(raw.replace(b"/Type /ObjStm /N 4", b"/Type /ObjStm /N 40"))


# ------------------------------------------------------------------ #
# JPEG (baseline DCT, round 8)                                         #
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (17, 9), (63, 8), (40, 40)])
def test_jpeg_round_trip_smooth(w, h):
    """JPEG is lossy: round-trip asserts exact dimensions and a small
    mean error on smooth content (Annex K table quantization)."""
    y, x = np.mgrid[0:h, 0:w]
    img = (64 + x * 2 + y).clip(0, 255).astype(np.uint8)
    d = mc.read_jpeg(mc.write_jpeg(w, h, img.tobytes()))
    assert (d["width"], d["height"]) == (w, h)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w)
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_round_trip_noise_stable():
    """Full-range noise exercises dense AC coefficients (ZRL/EOB
    paths); a second encode of the decode must be near-stable (the
    coefficients are already on the quantization lattice)."""
    img = RNG.randint(0, 256, (40, 56)).astype(np.uint8)
    d = mc.read_jpeg(mc.write_jpeg(56, 40, img.tobytes()))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(40, 56)
    d2 = mc.read_jpeg(mc.write_jpeg(56, 40, d["pixels"]))
    g2 = np.frombuffer(d2["pixels"], dtype=np.uint8).reshape(40, 56)
    assert np.abs(g2.astype(int) - got.astype(int)).mean() < 1.0


def test_jpeg_rejects_unsupported_and_corrupt():
    buf = mc.write_jpeg(16, 16, bytes(256))
    with pytest.raises(ValueError, match="SOI"):
        mc.read_jpeg(b"notajpeg")
    # progressive frame marker -> explicit unsupported, never misdecode
    with pytest.raises(ValueError, match="SOF2"):
        mc.read_jpeg(buf.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # multi-component (color) frames are out of declared scope
    bad = bytearray(buf)
    sof = bad.index(b"\xff\xc0")
    bad[sof + 9] = 3  # ncomp
    with pytest.raises(ValueError, match="component"):
        mc.read_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        mc.read_jpeg(buf[: len(buf) // 2])


def test_jpeg_truncation_never_leaks():
    """The _parser contract: every truncation point yields ValueError,
    never struct.error/IndexError (the quarantine path's guarantee)."""
    buf = mc.write_jpeg(24, 16, RNG.randint(0, 256, 384).astype(np.uint8).tobytes())
    for cut in range(2, len(buf), 7):
        try:
            mc.read_jpeg(buf[:cut])
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            pytest.fail(
                f"read_jpeg leaked {type(e).__name__} at cut {cut}: {e}"
            )
