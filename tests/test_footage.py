"""Real-footage ingestion (SURVEY.md §7 M5): PNG sequences, y4m streams,
and the pad-and-crop extension for non-multiple-of-8 geometry."""

import os
import struct
import zlib

import numpy as np
import pytest

from conftest import synthetic_video
from dct3d_tpu import cli, metrics
from dct3d_tpu.io import rawvideo, render
from dct3d_tpu.io.png import read_png, read_png_sequence


def _write_filtered_png(path, img, filter_type):
    """PNG writer applying one scanline filter everywhere (exercises the
    native unfilter paths that io/render.py's type-0 writer never emits)."""
    if img.ndim == 2:
        color, raw = 0, img[:, :, None]
    else:
        color, raw = 2, img
    h, w, nch = raw.shape
    raw = raw.astype(np.int32)
    lines = []
    prev = np.zeros((w, nch), np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.zeros_like(cur)
        left[1:] = cur[:-1]
        pleft = np.zeros_like(prev)
        pleft[1:] = prev[:-1]
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - pleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - pleft))
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, pleft)
            )
            f = cur - pred
        lines.append(bytes([filter_type]) + (f & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    with open(path, "wb") as fo:
        fo.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                 + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                 + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color", ["gray", "rgb"])
def test_png_reader_all_filters(tmp_path, rng, ftype, color):
    shape = (24, 40) if color == "gray" else (24, 40, 3)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    p = str(tmp_path / f"f{ftype}.png")
    _write_filtered_png(p, img, ftype)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_reader_reads_own_writer(tmp_path, rng):
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    p = str(tmp_path / "w.png")
    render._write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_sequence_roundtrip_through_cli(tmp_path):
    """PNG directory -> encode (geometry from content) -> decode -> PSNR."""
    d = tmp_path / "seq"
    d.mkdir()
    clip = synthetic_video(16, 48, 64, seed=40)
    for i in range(16):
        render._write_png(str(d / f"frame_{i:04d}.png"), clip[i])
    enc = str(tmp_path / "seq.bin")
    dec = str(tmp_path / "seq.raw")
    assert cli.main(["encode", str(d), enc]) == 0
    assert cli.main(["decode", enc, dec, "64", "48", "16"]) == 0
    out = rawvideo.read_video(dec, 64, 48)
    assert metrics.psnr(clip, out) > 30.0


def test_png_sequence_gray_conversion(tmp_path, rng):
    d = tmp_path / "c"
    d.mkdir()
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    render._write_png(str(d / "a.png"), img)
    got = read_png_sequence(str(d))
    r, g, b = (img[..., c].astype(np.uint32) for c in range(3))
    want = ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(got[0], want)


def _write_y4m(path, clip, chroma="420jpeg"):
    t, h, w = clip.shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode())
        for k in range(t):
            f.write(b"FRAME\n")
            f.write(clip[k].tobytes())
            if chroma != "mono":
                div = {"420jpeg": 4, "422": 2, "444": 1}[chroma]
                f.write(b"\x80" * (2 * w * h // div))


@pytest.mark.parametrize("chroma", ["420jpeg", "444", "mono"])
def test_y4m_reader(tmp_path, chroma):
    from dct3d_tpu.io.y4m import probe_y4m, read_y4m

    clip = synthetic_video(8, 32, 48, seed=41)
    p = str(tmp_path / "v.y4m")
    _write_y4m(p, clip, chroma)
    info = probe_y4m(p)
    assert (info["width"], info["height"]) == (48, 32)
    assert info["fps"] == 25.0
    video, _ = read_y4m(p)
    np.testing.assert_array_equal(video, clip)


def test_y4m_through_cli(tmp_path):
    clip = synthetic_video(16, 32, 48, seed=42)
    src = str(tmp_path / "v.y4m")
    _write_y4m(src, clip)
    enc = str(tmp_path / "v.bin")
    dec = str(tmp_path / "v.raw")
    assert cli.main(["encode", src, enc]) == 0
    assert cli.main(["decode", enc, dec, "48", "32", "16"]) == 0
    out = rawvideo.read_video(dec, 48, 32)
    assert metrics.psnr(clip, out) > 30.0


def test_pad_and_crop_roundtrip(tmp_path):
    """Non-multiple-of-8 geometry: encode --pad, decode --crop recovers the
    original frame exactly in shape and closely in content (SURVEY.md §7
    hard part 5)."""
    clip = synthetic_video(16, 45, 60, seed=43)  # 60x45: neither divides 8
    src = str(tmp_path / "odd.raw")
    rawvideo.write_video(src, clip)
    enc = str(tmp_path / "odd.bin")
    dec = str(tmp_path / "odd.raw.out")
    assert cli.main(["encode", src, enc, "60", "45", "--pad"]) == 0
    assert cli.main(["decode", enc, dec, "64", "48", "16",
                     "--crop", "60x45"]) == 0
    out = rawvideo.read_video(dec, 60, 45)
    assert out.shape == clip.shape
    assert metrics.psnr(clip, out) > 30.0


def test_pad_rejected_without_flag(tmp_path):
    clip = synthetic_video(8, 45, 60, seed=44)
    src = str(tmp_path / "odd2.raw")
    rawvideo.write_video(src, clip)
    with pytest.raises(ValueError):
        cli.main(["encode", src, str(tmp_path / "x.bin"), "60", "45"])


def test_render_all_frames(tmp_path, clip):
    p = str(tmp_path / "v.raw")
    rawvideo.write_video(p, clip)
    assert cli.main(["render", p, "64", "64", "--png-prefix",
                     str(tmp_path / "img"), "--frames", "all"]) == 0
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == clip.shape[0]
    assert cli.main(["render", p, "64", "64", "--png-prefix",
                     str(tmp_path / "rng"), "--frames", "2:5"]) == 0
    assert len([f for f in os.listdir(tmp_path) if f.startswith("rng")]) == 3


def test_y4m_write_read_roundtrip(tmp_path):
    from dct3d_tpu.io.y4m import read_y4m, write_y4m

    clip = synthetic_video(8, 32, 48, seed=45)
    p = str(tmp_path / "o.y4m")
    write_y4m(p, clip, fps=24.0)
    back, info = read_y4m(p)
    np.testing.assert_array_equal(back, clip)
    assert info["chroma"] == "mono" and info["fps"] == 24.0


def test_cli_decode_to_y4m(tmp_path):
    from dct3d_tpu.io.y4m import read_y4m

    clip = synthetic_video(16, 32, 48, seed=46)
    src = str(tmp_path / "v.raw")
    rawvideo.write_video(src, clip)
    enc = str(tmp_path / "v.bin")
    out = str(tmp_path / "v.y4m")
    assert cli.main(["encode", src, enc, "48", "32"]) == 0
    assert cli.main(["decode", enc, out, "48", "32", "16"]) == 0
    video, _ = read_y4m(out)
    assert video.shape == (16, 32, 48)
    assert metrics.psnr(clip, video) > 30.0


def test_y4m_rgb_reader_roundtrip(tmp_path):
    """RGB -> BT.601 YCbCr 444 -> read_y4m_rgb recovers RGB within the
    limited-range quantization error (conversion is its own inverse)."""
    from dct3d_tpu.io.render import _rgb_to_ycbcr444
    from dct3d_tpu.io.y4m import read_y4m_rgb

    rng = np.random.default_rng(44)
    rgb = rng.integers(0, 256, (4, 16, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "c.y4m")
    with open(p, "wb") as f:
        f.write(b"YUV4MPEG2 W24 H16 F25:1 Ip A1:1 C444\n")
        for k in range(4):
            f.write(b"FRAME\n")
            for plane in _rgb_to_ycbcr444(rgb[k]):
                f.write(plane.tobytes())
    back, info = read_y4m_rgb(p)
    assert info["chroma"] == "444"
    assert back.shape == rgb.shape
    # Limited-range YCbCr cannot carry full-range RGB losslessly; ~2 LSBs.
    assert np.max(np.abs(back.astype(int) - rgb.astype(int))) <= 3


def test_y4m_rgb_through_cli(tmp_path):
    """encode --rgb on a 4:2:0 y4m: chroma upsamples by repetition and the
    container decodes to 3 channels."""
    from dct3d_tpu.io.y4m import read_y4m_rgb

    clip = synthetic_video(8, 32, 48, seed=45)
    src = str(tmp_path / "v.y4m")
    _write_y4m(src, clip, "420jpeg")  # gray luma + flat 0x80 chroma
    rgb, _ = read_y4m_rgb(src)
    assert rgb.shape == (8, 32, 48, 3)
    # Flat chroma = achromatic: channels agree within rounding.
    assert np.max(np.abs(rgb[..., 0].astype(int) - rgb[..., 2].astype(int))) <= 1
    enc = str(tmp_path / "v.bin")
    dec = str(tmp_path / "v.rgb")
    assert cli.main(["encode", src, enc, "--rgb"]) == 0
    assert cli.main(["decode", enc, dec, "48", "32", "--rgb"]) == 0
    out = rawvideo.read_video(dec, 48, 32, channels=3)
    assert metrics.psnr(rgb, out) > 30.0


def test_y4m_rgb_rejects_mono(tmp_path):
    from dct3d_tpu.io.y4m import read_y4m_rgb

    clip = synthetic_video(2, 16, 16, seed=46)
    p = str(tmp_path / "m.y4m")
    _write_y4m(p, clip, "mono")
    with pytest.raises(ValueError, match="without --rgb"):
        read_y4m_rgb(p)


def test_render_play_paces_y4m_into_player(tmp_path):
    """--play pipes a valid fps-paced y4m stream into the player command;
    a capture-to-file stand-in verifies the bytes (no display here)."""
    import sys as _sys

    from dct3d_tpu.io.y4m import read_y4m

    clip = synthetic_video(8, 16, 16, seed=47)
    src = str(tmp_path / "v.raw")
    rawvideo.write_video(src, clip)
    sink = str(tmp_path / "seen.y4m")
    player = (
        f"{_sys.executable} -c "
        "\"import sys,shutil;shutil.copyfileobj(sys.stdin.buffer,"
        "open(sys.argv[1],'wb'))\" " + sink
    )
    assert cli.main(["render", src, "16", "16", "--play",
                     "--fps", "500", "--player", player]) == 0
    back, info = read_y4m(sink)
    np.testing.assert_array_equal(back, clip)
    assert info["fps"] == 500.0


def test_render_play_no_player_errors(tmp_path, capsys, monkeypatch):
    import shutil as _shutil

    clip = synthetic_video(2, 16, 16, seed=48)
    src = str(tmp_path / "v.raw")
    rawvideo.write_video(src, clip)
    monkeypatch.setattr(_shutil, "which", lambda *_: None)
    assert cli.main(["render", src, "16", "16", "--play"]) == 2
    assert "player" in capsys.readouterr().err


def test_cli_decode_rgb_to_y4m(tmp_path):
    """decode --rgb to a .y4m path emits a C444 stream that read_y4m_rgb
    round-trips within the limited-range quantization error."""
    from dct3d_tpu.io.y4m import read_y4m_rgb

    rng = np.random.default_rng(49)
    rgb = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    src = str(tmp_path / "c.rgb")
    rgb.tofile(src)
    enc = str(tmp_path / "c.bin")
    out = str(tmp_path / "c.y4m")
    assert cli.main(["encode", src, enc, "32", "32", "--rgb"]) == 0
    assert cli.main(["decode", enc, out, "32", "32", "--rgb"]) == 0
    back, info = read_y4m_rgb(out)
    assert info["chroma"] == "444" and back.shape == rgb.shape
    dec = str(tmp_path / "c.dec")
    assert cli.main(["decode", enc, dec, "32", "32", "--rgb"]) == 0
    want = rawvideo.read_video(dec, 32, 32, channels=3)
    assert np.max(np.abs(back.astype(int) - want.astype(int))) <= 3
