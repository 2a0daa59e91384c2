"""One-process CLI verification matrix on the real TPU.

Drives every encode/decode surface end to end (base, parity, pad/crop,
index, turbo, turbo-rgb, checkpoint resume) and asserts the cross-profile
invariants.  One process so the relay's per-program first-execution cost
is paid once per program, not once per step.

Run: python tools/tpu_verify_cli.py  (~5-10 min through the relay)
"""

from __future__ import annotations

import io
import json
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from dct3d_tpu.cli import main


def info(path: str) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["info", path]) == 0
    return json.loads(buf.getvalue())


def run() -> None:
    W = tempfile.mkdtemp()
    rd = lambda p: open(p, "rb").read()  # noqa: E731

    main(["devices"])
    main(["capture", f"{W}/src.raw", "320", "240", "32", "--kind", "blocks"])

    # base + parity + psnr + render
    main(["encode", f"{W}/src.raw", f"{W}/enc.bin", "320", "240"])
    main(["decode", f"{W}/enc.bin", f"{W}/dec.raw", "320", "240", "32"])
    main(["psnr", f"{W}/src.raw", f"{W}/dec.raw", "320", "240"])
    main(["render", f"{W}/dec.raw", "320", "240", "--png-prefix", f"{W}/o"])
    main(["encode", f"{W}/src.raw", f"{W}/enc_p.bin", "320", "240",
          "--parity"])
    main(["decode", f"{W}/enc_p.bin", f"{W}/dec_p.raw", "320", "240", "32"])
    assert rd(f"{W}/dec_p.raw") == rd(f"{W}/dec.raw")

    # seekable index container: no frame count needed, identical pixels.
    # Round 5: this is the DEFAULT for file outputs — the plain encode
    # above already wrote one, byte-identical to explicit --index.
    main(["encode", f"{W}/src.raw", f"{W}/enc_i.d3v", "320", "240",
          "--index"])
    ii = info(f"{W}/enc_i.d3v")
    assert [m["type"] for m in ii["members"]] == ["temporal", "index"], ii
    assert ii["members"][1]["gops"] == 4
    assert rd(f"{W}/enc_i.d3v") == rd(f"{W}/enc.bin")
    main(["decode", f"{W}/enc_i.d3v", f"{W}/dec_i.raw", "320", "240"])
    assert rd(f"{W}/dec_i.raw") == rd(f"{W}/dec.raw")
    # --no-index restores the raw headerless stream (needs a count);
    # --parity --index keeps the reference-byte-exact stream and writes
    # the index to an .idx sidecar decode auto-loads (count optional,
    # scan-free entropy).
    main(["encode", f"{W}/src.raw", f"{W}/enc_raw.bin", "320", "240",
          "--no-index"])
    assert rd(f"{W}/enc_raw.bin")[:4] != b"D3MH"
    main(["encode", f"{W}/src.raw", f"{W}/enc_ps.bin", "320", "240",
          "--parity", "--index"])
    assert rd(f"{W}/enc_ps.bin") == rd(f"{W}/enc_p.bin")
    assert rd(f"{W}/enc_ps.bin.idx")[:4] == b"D3MH"
    main(["decode", f"{W}/enc_ps.bin", f"{W}/dec_ps.raw", "320", "240"])
    assert rd(f"{W}/dec_ps.raw") == rd(f"{W}/dec.raw")

    # random-access decode: raw stream, indexed container, turbo — the
    # ranges must equal the full decode's slice byte-for-byte
    fpx = 320 * 240
    full = rd(f"{W}/dec.raw")
    main(["decode", f"{W}/enc.bin", f"{W}/dec_r.raw", "320", "240",
          "--range", "5:21"])
    assert rd(f"{W}/dec_r.raw") == full[5 * fpx : 21 * fpx]
    main(["decode", f"{W}/enc_i.d3v", f"{W}/dec_ir.raw", "320", "240",
          "--range", "11:29"])
    assert rd(f"{W}/dec_ir.raw") == full[11 * fpx : 29 * fpx]

    # turbo: identical pixels, auto-detected decode
    main(["encode", f"{W}/src.raw", f"{W}/enc_t.d3t", "320", "240",
          "--turbo"])
    ti = info(f"{W}/enc_t.d3t")
    assert ti["kind"] == "turbo" and ti["frames"] == 32, ti
    main(["decode", f"{W}/enc_t.d3t", f"{W}/dec_t.raw", "320", "240"])
    assert rd(f"{W}/dec_t.raw") == rd(f"{W}/dec.raw")

    main(["decode", f"{W}/enc_t.d3t", f"{W}/dec_tr.raw", "320", "240",
          "--range", "8:24"])
    assert rd(f"{W}/dec_tr.raw") == full[8 * fpx : 24 * fpx]

    # turbo zlib wire: same pixels, codec sniffed per stream on decode
    main(["encode", f"{W}/src.raw", f"{W}/enc_tz.d3t", "320", "240",
          "--turbo", "--turbo-codec", "zlib"])
    main(["decode", f"{W}/enc_tz.d3t", f"{W}/dec_tz.raw", "320", "240"])
    assert rd(f"{W}/dec_tz.raw") == rd(f"{W}/dec.raw")

    # turbo checkpoint resume + no-flag decode
    main(["encode", f"{W}/src.raw", f"{W}/ck.d3t", "320", "240", "16",
          "--turbo", "--checkpoint-every", "2"])
    main(["encode", f"{W}/src.raw", f"{W}/ck.d3t", "320", "240", "--turbo",
          "--checkpoint-every", "2"])
    main(["decode", f"{W}/ck.d3t", f"{W}/dec_ck.raw"])
    assert rd(f"{W}/dec_ck.raw") == rd(f"{W}/dec.raw")

    # RGB: reference-profile container and turbo-rgb, flagless decode
    main(["capture", f"{W}/c.rgb", "64", "64", "16", "--rgb"])
    main(["encode", f"{W}/c.rgb", f"{W}/c.d3v", "64", "64", "--rgb"])
    main(["decode", f"{W}/c.d3v", f"{W}/c_dec.rgb", "64", "64"])
    main(["encode", f"{W}/c.rgb", f"{W}/ct.d3t", "64", "64", "--rgb",
          "--turbo"])
    assert info(f"{W}/ct.d3t")["kind"] == "turbo-rgb"
    main(["decode", f"{W}/ct.d3t", f"{W}/ct_dec.rgb", "64", "64"])
    assert rd(f"{W}/ct_dec.rgb") == rd(f"{W}/c_dec.rgb")
    # RGB random access, both profiles
    fpx3 = 64 * 64 * 3
    main(["decode", f"{W}/c.d3v", f"{W}/c_r.rgb", "64", "64",
          "--range", "4:12"])
    assert rd(f"{W}/c_r.rgb") == rd(f"{W}/c_dec.rgb")[4 * fpx3 : 12 * fpx3]
    main(["decode", f"{W}/ct.d3t", f"{W}/ct_r.rgb", "64", "64",
          "--range", "6:14"])
    assert rd(f"{W}/ct_r.rgb") == rd(f"{W}/c_dec.rgb")[6 * fpx3 : 14 * fpx3]

    # turbo worst-case retry (quant 0 -> dense exceptions -> argsort path)
    main(["capture", f"{W}/n.raw", "64", "48", "8", "--kind", "blocks"])
    main(["encode", f"{W}/n.raw", f"{W}/n.d3t", "64", "48", "--turbo",
          "--quant", "0"])
    main(["encode", f"{W}/n.raw", f"{W}/n.bin", "64", "48", "--quant", "0"])
    main(["decode", f"{W}/n.d3t", f"{W}/n_t.raw", "64", "48",
          "--quant", "0"])
    main(["decode", f"{W}/n.bin", f"{W}/n_r.raw", "64", "48", "8",
          "--quant", "0"])
    assert rd(f"{W}/n_t.raw") == rd(f"{W}/n_r.raw")

    # odd geometry pad/crop
    main(["capture", f"{W}/odd.raw", "60", "45", "8", "--kind", "blocks"])
    main(["encode", f"{W}/odd.raw", f"{W}/odd.bin", "60", "45", "--pad"])
    main(["decode", f"{W}/odd.bin", f"{W}/odd_dec.raw", "64", "48", "8",
          "--crop", "60x45"])

    # mesh feature matrix (1x1 — the only mesh one real chip offers; the
    # multi-device combos are pinned on the CPU mesh in
    # tests/test_mesh_matrix.py).  Serial sink so bytes match exactly.
    main(["encode", f"{W}/c.rgb", f"{W}/cm.d3v", "64", "64", "--rgb",
          "--mesh", "1x1", "--deflate-workers", "0"])
    main(["encode", f"{W}/c.rgb", f"{W}/c0.d3v", "64", "64", "--rgb",
          "--deflate-workers", "0"])
    assert rd(f"{W}/cm.d3v") == rd(f"{W}/c0.d3v")
    main(["encode", f"{W}/src.raw", f"{W}/km.d3mh", "320", "240",
          "--checkpoint-every", "2", "--mesh", "1x1",
          "--deflate-workers", "0"])
    main(["encode", f"{W}/src.raw", f"{W}/k0.d3mh", "320", "240",
          "--checkpoint-every", "2", "--deflate-workers", "0"])
    assert rd(f"{W}/km.d3mh") == rd(f"{W}/k0.d3mh")
    main(["encode", f"{W}/src.raw", f"{W}/tkm.d3t", "320", "240", "--turbo",
          "--checkpoint-every", "2", "--mesh", "1x1"])
    assert rd(f"{W}/tkm.d3t") == rd(f"{W}/ck.d3t")

    # bf16 fast profile: decodes with the DEFAULT decoder, --parity rejects
    main(["encode", f"{W}/src.raw", f"{W}/b16.bin", "320", "240",
          "--dtype", "bf16"])
    assert main(["encode", f"{W}/src.raw", f"{W}/x.bin", "320", "240",
                 "--dtype", "bf16", "--parity"]) == 2
    main(["decode", f"{W}/b16.bin", f"{W}/b16.raw", "320", "240", "32"])

    # fps-paced playback into a y4m-reading command (no display here)
    import sys as _sys
    player = (f"{_sys.executable} -c \"import sys,shutil;"
              "shutil.copyfileobj(sys.stdin.buffer,"
              f"open('{W}/play.y4m','wb'))\"")
    assert main(["render", f"{W}/c_dec.rgb", "64", "64", "--rgb", "--play",
                 "--fps", "120", "--player", player]) == 0

    # 4K geometry smoke: different Pallas block shapes (w32=960, non-%512
    # cube paddings) through every fast path; turbo pixels must equal the
    # reference profile's at this size too.
    main(["capture", f"{W}/4k.raw", "3840", "2160", "8", "--kind", "blocks"])
    main(["encode", f"{W}/4k.raw", f"{W}/4k.bin", "3840", "2160"])
    main(["decode", f"{W}/4k.bin", f"{W}/4k.dec", "3840", "2160", "8"])
    main(["encode", f"{W}/4k.raw", f"{W}/4k.d3t", "3840", "2160", "--turbo"])
    main(["decode", f"{W}/4k.d3t", f"{W}/4k.tdec", "3840", "2160"])
    assert rd(f"{W}/4k.tdec") == rd(f"{W}/4k.dec")

    print("tpu_verify_cli: ALL STEPS OK", flush=True)


if __name__ == "__main__":
    run()
