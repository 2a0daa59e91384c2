"""Two-process multi-host simulation on CPU (DCN layer validation).

Runs the real jax.distributed runtime with N localhost processes, each
ingesting its host_frame_span of a deterministic clip, encoding on its own
virtual CPU devices, and gathering members to process 0 — validating
parallel/multihost.py's cross-process paths (process_allgather lengths +
payload, member ordering) that single-process tests cannot reach.

Usage: python tools/multihost_sim.py            # spawns the workers
       python tools/multihost_sim.py worker I N PORT OUT  (internal)
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(idx: int, nproc: int, port: int, out: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=idx,
    )
    sys.path.insert(0, REPO)
    import numpy as np

    from dct3d_tpu import CodecConfig
    from dct3d_tpu.io import synthetic
    from dct3d_tpu.parallel import multihost
    from dct3d_tpu.parallel.mesh import make_mesh

    cfg = CodecConfig()
    total = 40  # 5 GOPs over 2 hosts -> spans of 24 and 16 frames
    clip = synthetic.moving_gradient(total, 64, 64, seed=3)
    lo, hi = multihost.host_frame_span(total, cfg, idx, nproc)
    mesh = make_mesh(gop=2, tile=1, devices=jax.local_devices())
    import time

    t0 = time.perf_counter()
    data = multihost.encode_multihost(
        clip[lo:hi], 64, 64, total, mesh, cfg
    )
    wall = time.perf_counter() - t0
    # Scaling-efficiency evidence (BASELINE >=80% 1->N hosts): per-host
    # encode is fully independent; the ONLY cross-host work is the ordered
    # gather of compressed bytes (two process_allgathers).  Time it alone.
    t0 = time.perf_counter()
    multihost.gather_ordered_bytes(b"x" * (len(data) if data else 4096))
    gather_wall = time.perf_counter() - t0
    print(
        f"process {idx}: encode+gather {wall:.3f}s, standalone gather "
        f"{gather_wall * 1e3:.1f} ms ({100 * gather_wall / wall:.1f}% of "
        "the step — the only serial cross-host cost)", flush=True,
    )
    # Turbo profile over the same spans/mesh: per-GOP members, so the
    # gathered container must be BYTE-identical to a single-process
    # single-device turbo encode of the whole clip.
    tdata = multihost.encode_multihost(
        clip[lo:hi], 64, 64, total, mesh, cfg, turbo=True
    )
    # --- distributed decode: every process decodes ITS temporal member of
    # the shared container and must reproduce the full decode's span
    # EXACTLY (round-4; the scaling bench times this same path).
    from jax.experimental import multihost_utils

    from dct3d_tpu.codec.decoder import decode_video

    if idx == 0:
        with open(out + ".full", "wb") as f:
            f.write(data)
    multihost_utils.sync_global_devices("container_written")
    full_container = open(out + ".full", "rb").read()
    temporal = [
        m for m in multihost.split_members(full_container)
        if m[2] == multihost.MEMBER_TEMPORAL
    ]
    # A host may emit main + tail members (gop-mesh remainder): decode
    # every member whose frame span falls inside [lo, hi).
    full = multihost.decode_multihost_container(full_container, 64, 64, cfg)
    at = 0
    for frames_i, payload_i, _ in temporal:
        if lo <= at and at + frames_i <= hi:
            mine = decode_video(payload_i, 64, 64, frames_i, cfg)
            assert np.array_equal(mine, full[at : at + frames_i]), (
                f"process {idx}: distributed member decode diverged from "
                "the full-container decode"
            )
        at += frames_i
    assert at == total, (at, total)
    # --- checkpoint + resume across processes: each host checkpoints its
    # span with a simulated interruption, resumes, and the spliced
    # per-host files decode to the same pixels as the plain container.
    from dct3d_tpu.codec.checkpoint import CheckpointingEncoder

    ck = out + f".ck{idx}"
    for stale in (ck, ck + ".meta"):
        if os.path.exists(stale):
            os.remove(stale)
    span = clip[lo:hi]
    half = (span.shape[0] // (2 * cfg.gop_size)) * cfg.gop_size
    with CheckpointingEncoder(ck, 64, 64, cfg, checkpoint_gops=1) as enc:
        enc.push(span[:half])
    with CheckpointingEncoder(ck, 64, 64, cfg, checkpoint_gops=1) as enc:
        assert enc.frames_done == half, (enc.frames_done, half)
        enc.push(span[half:])
    assembled = multihost.gather_ordered_bytes(open(ck, "rb").read())
    if idx == 0:
        ck_video = multihost.decode_multihost_container(
            assembled, 64, 64, cfg
        )
        assert np.array_equal(ck_video, full), (
            "cross-process checkpoint-resume decode diverged"
        )
        print("process 0: distributed decode + checkpoint-resume exact",
              flush=True)
    if idx == 0:
        assert data is not None
        with open(out, "wb") as f:
            f.write(data)
        # Decode and check against the source.
        from dct3d_tpu import psnr

        video = multihost.decode_multihost_container(data, 64, 64, cfg)
        assert video.shape == (total, 64, 64), video.shape
        p = psnr(clip, video)
        assert p > 30.0, p
        members = multihost.split_members(data)
        print(
            f"process 0: {len(members)} members "
            f"{[m[0] for m in members]}, PSNR {p:.2f} dB", flush=True
        )
        from dct3d_tpu.codec.turbo import (
            decode_turbo_container, encode_turbo_video,
        )

        assert tdata == encode_turbo_video(clip, cfg), (
            "multihost turbo container diverged from single-device encode"
        )
        tvideo = decode_turbo_container(tdata, 64, 64, cfg)
        assert np.array_equal(tvideo, video), (
            "turbo pixels diverged from the reference profile's"
        )
        print("process 0: turbo container byte-identical, pixels identical",
              flush=True)
    else:
        assert data is None and tdata is None


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return 0
    import socket
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = tempfile.mktemp(suffix=".d3mh")
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(i), str(nproc), str(port), out]
        )
        for i in range(nproc)
    ]
    rc = [p.wait(timeout=300) for p in procs]
    assert rc == [0] * nproc, rc
    assert os.path.getsize(out) > 0
    print("MULTIHOST SIM PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
