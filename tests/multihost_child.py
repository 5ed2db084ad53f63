"""Child process for the 2-process multi-host CPU test (not a pytest file).

Usage: python multihost_child.py <proc_id> <nproc> <port> <outdir>

Each process owns 4 virtual CPU devices; jax.distributed joins them into one
8-device runtime.  Runs one observation-sharded distributed-BA step over the
GLOBAL mesh and writes the (replicated) result, which the parent compares
against a single-process reference — proving the Schur/psum path works across
process boundaries, not just across devices of one process."""

import sys


def make_problem_np(n_cams=4, n_pts=64, n_dev=8):
    """Deterministic numpy problem, identical on every process (no jax PRNG
    before distributed init)."""
    import numpy as np
    rng = np.random.default_rng(42)
    pts_gt = rng.uniform(-2.0, 2.0, (n_pts, 3)) + np.array([0.0, 0.0, 6.0])
    poses = []
    for c in range(n_cams):
        poses.append([1.0, 0.0, 0.0, 0.0, 0.3 * c, 0.0, 0.0])
    poses_gt = np.asarray(poses, np.float32)
    O = 16 * n_dev * ((n_cams * n_pts) // (16 * n_dev))
    cam_idx = (np.arange(O) % n_cams).astype(np.int32)
    pt_idx = (np.arange(O) % n_pts).astype(np.int32)
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    X = pts_gt[pt_idx]
    t = poses_gt[cam_idx, 4:7]
    xc = X + t  # identity rotations
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], axis=1).astype(np.float32)
    poses0 = poses_gt.copy()
    poses0[:n_cams - 1, 4:] += 0.05 * rng.standard_normal((n_cams - 1, 3))
    pts0 = (pts_gt + 0.05 * rng.standard_normal(pts_gt.shape)).astype(np.float32)
    return (poses0.astype(np.float32), pts0, cam_idx, pt_idx, uv,
            np.ones(O, np.float32), np.ones(O, bool))


def run_distributed(mesh, problem):
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from asdslam_tpu.parallel import dist

    poses0, pts0, cam_idx, pt_idx, uv, inv_s2, valid = problem
    K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
    # point-major layout is deterministic numpy on replicated host data, so
    # every process builds identical shards and donates its local ones
    n_dev = mesh.devices.size
    (pts_pm, cam_o, pt_o, uv_o, s2_o, va_o, _) = dist.layout_point_major(
        pts0, cam_idx, pt_idx, uv, inv_s2, valid, n_dev)
    rep = lambda x: dist.shard_to_mesh(mesh, x, P())
    shd = lambda x: dist.shard_to_mesh(mesh, x, P("data"))
    new_poses, new_pts = dist.distributed_ba_step_pm(
        mesh, rep(poses0), shd(pts_pm), shd(cam_o), shd(pt_o), shd(uv_o),
        shd(s2_o), shd(va_o), K, n_opt=3)
    # result fetch: one final all-gather so every process can materialize the
    # sharded point output (NOT part of the per-iteration communication)
    import jax
    from jax.sharding import NamedSharding
    new_pts = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(new_pts)
    return new_poses, new_pts[:len(pts0)]


def main():
    proc_id, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                    sys.argv[3], sys.argv[4])
    import numpy as np
    import jax
    from asdslam_tpu.parallel import dist

    dist.init_multihost(f"localhost:{port}", nproc, proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    mesh = dist.global_mesh()

    problem = make_problem_np(n_dev=4 * nproc)
    new_poses, new_pts = run_distributed(mesh, problem)
    # out_specs are fully replicated: every process can materialize them
    np.savez(f"{outdir}/result_{proc_id}.npz",
             poses=np.asarray(new_poses), pts=np.asarray(new_pts))
    print(f"proc {proc_id}: OK")


if __name__ == "__main__":
    main()
