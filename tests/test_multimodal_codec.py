"""decode_media is a real container-header parser (r6 VERDICT item 5):
these pin its behavior on spec-valid payloads, its error path on junk, and
that the PNG builder emits genuinely decodable zlib scanlines (not just a
recognizable magic)."""

from __future__ import annotations

import struct
import zlib

import pytest

from zylyty_data_engineer_challenge_spark.operators.multimodal import (
    _build_bmp,
    _build_gif,
    _build_png,
    decode_media,
)


def test_png_roundtrip_and_real_idat():
    b = _build_png(5, 7, b"seedbytes")
    feat = decode_media(b, "image/png")
    assert feat == {"fmt": "png", "width": 5, "height": 7, "bpp": 24, "n_bytes": len(b)}
    # IDAT must inflate to exactly h * (1 filter byte + 3w pixel bytes)
    assert b[12:16] == b"IHDR"
    idat_len = struct.unpack(">I", b[33:37])[0]
    assert b[37:41] == b"IDAT"
    raw = zlib.decompress(b[41 : 41 + idat_len])
    assert len(raw) == 7 * (1 + 3 * 5)
    # chunk CRCs are real CRC32s over tag+data
    crc = struct.unpack(">I", b[41 + idat_len : 45 + idat_len])[0]
    assert crc == zlib.crc32(b[37 : 41 + idat_len]) & 0xFFFFFFFF


def test_bmp_header_fields():
    b = _build_bmp(6, 4, b"xyz")
    feat = decode_media(b, "image/bmp")
    assert (feat["fmt"], feat["width"], feat["height"], feat["bpp"]) == ("bmp", 6, 4, 24)
    # declared file size in the BMP header matches the actual byte length
    assert struct.unpack("<I", b[2:6])[0] == len(b)
    # 6px * 3B = 18 -> padded to 20-byte rows
    assert len(b) == 54 + 20 * 4


def test_bmp_negative_height_is_topdown():
    b = bytearray(_build_bmp(3, 2, b""))
    b[22:26] = struct.pack("<i", -2)  # top-down orientation per BMP spec
    assert decode_media(bytes(b), "image/bmp")["height"] == 2


def test_gif_screen_descriptor():
    b = _build_gif(300, 200)
    feat = decode_media(b, "image/gif")
    assert (feat["fmt"], feat["width"], feat["height"], feat["bpp"]) == ("gif", 300, 200, 8)
    assert b[-1:] == b"\x3b"  # trailer


def test_text_path_and_junk_rejection():
    assert decode_media(b"hello", "text/plain")["fmt"] == "text"
    assert decode_media(b"hello", "text/plain")["n_bytes"] == 5
    with pytest.raises(ValueError):
        decode_media(b"\x00\x01junkjunk", "image/png")
    with pytest.raises(ValueError):
        # PNG magic but first chunk is not IHDR
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x00FAKE", "image/png")


def test_wav_roundtrip_and_chunk_walk():
    from zylyty_data_engineer_challenge_spark.operators.multimodal import _build_wav

    b = _build_wav(25, 16000, 2, b"pcm-seed")
    feat = decode_media(b, "audio/wav")
    assert feat["fmt"] == "wav"
    assert feat["sample_rate"] == 16000
    assert feat["channels"] == 2
    assert feat["bits"] == 16
    assert feat["n_samples"] == 25
    # declared RIFF size matches the actual byte length
    assert struct.unpack("<I", b[4:8])[0] == len(b) - 8
    # chunk walker must survive a leading non-fmt chunk (odd size -> padded)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    reordered = b[:12] + extra + b[12:]
    reordered = reordered[:4] + struct.unpack("<I", b[4:8])[0].to_bytes(4, "little") + reordered[8:]
    feat2 = decode_media(reordered, "audio/wav")
    assert feat2["n_samples"] == 25 and feat2["sample_rate"] == 16000
    # truncated fmt/data must fail loud
    with pytest.raises(ValueError):
        decode_media(b[:20], "audio/wav")
