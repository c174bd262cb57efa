

class TestFusedSchedule:
    def test_scan_matches_sequential_passes(self):
        """ba_schedule_pairs (one compiled scan) must reproduce the
        per-pass ba_optimize_pairs sequence with interleaved camera
        inits, to f64 tightness."""
        import numpy as np
        import jax.numpy as jnp
        from openpano_tpu.camera.bundle_adjuster import (
            BAPairProblem, ba_optimize_pairs, ba_schedule_pairs,
        )
        from openpano_tpu.camera.estimator import _np_rod, _np_unrod
        from openpano_tpu.camera.camera import intrinsic

        rng = np.random.default_rng(11)
        n, P, M = 4, 6, 16
        # synthetic rotational scene: cameras looking at shared points
        f = 500.0
        yaws = np.array([0.0, 0.05, 0.10, 0.15])
        pts3 = rng.normal(size=(P * M, 3)) + [0, 0, 5]

        def project(yaw, X):
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            x = X @ R.T
            return f * x[:, :2] / x[:, 2:3]

        cam_to = np.array([0, 1, 1, 2, 2, 3], np.int32)
        cam_from = np.array([1, 0, 2, 1, 3, 2], np.int32)
        pt_to = np.zeros((P, M, 2))
        pt_from = np.zeros((P, M, 2))
        for p in range(P):
            X = pts3[p * M : (p + 1) * M]
            pt_to[p] = project(yaws[cam_to[p]], X)
            pt_from[p] = project(yaws[cam_from[p]], X)
        prob = BAPairProblem(
            pt_to=jnp.asarray(pt_to), pt_from=jnp.asarray(pt_from),
            w=jnp.asarray(np.ones((P, M))),
            cam_to=jnp.asarray(cam_to), cam_from=jnp.asarray(cam_from),
            swapped=jnp.asarray(np.zeros(P, bool)),
            pair_w=jnp.asarray(np.zeros(P)),
        )
        params0 = np.zeros((n, 6))
        params0[:, 0] = f * 1.1  # perturbed focal

        # edge schedule: (0->1) activates pairs 0..1, (1->2) 2..3, (2->3) 4..5
        edges = [(0, 1, 2), (1, 2, 4), (2, 3, 6)]
        Hs = []
        for now, nxt, _ in edges:
            # homography next->now from the TRUE cameras
            K = intrinsic(f, 0, 0)
            cy, sy = np.cos(yaws[nxt] - yaws[now]), np.sin(yaws[nxt] - yaws[now])
            R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Hs.append(K @ R @ np.linalg.inv(K))

        # sequential reference: host init + one LM pass per edge
        params = params0.copy()
        tot_seq = 0
        for (now, nxt, act), H in zip(edges, Hs):
            K_now = intrinsic(params[now, 0], params[now, 1], params[now, 2])
            R_now = _np_rod(params[now, 3:6])
            K_next = intrinsic(params[nxt, 0], 0.0, 0.0)
            Mt = np.linalg.inv(K_now) @ H @ K_next
            params[nxt, 1:3] = 0.0
            params[nxt, 3:6] = _np_unrod((R_now.T @ Mt).T)
            pw = np.zeros(P)
            pw[:act] = 1.0
            out, it = ba_optimize_pairs(
                jnp.asarray(params), prob._replace(pair_w=jnp.asarray(pw)),
                jnp.asarray(0), n, 5.0, return_iters=True, max_iter=10,
                patience=1)
            params = np.array(out)
            tot_seq += int(it)

        # fused scan
        pw_steps = np.zeros((len(edges), P))
        for k, (_, _, act) in enumerate(edges):
            pw_steps[k, :act] = 1.0
        out_f, it_f = ba_schedule_pairs(
            jnp.asarray(params0), prob, jnp.asarray(0), n, 5.0,
            jnp.asarray([e[0] for e in edges], jnp.int32),
            jnp.asarray([e[1] for e in edges], jnp.int32),
            jnp.asarray(np.stack(Hs)),
            jnp.ones(len(edges), jnp.int32),
            jnp.asarray(pw_steps),
            max_iter=10, patience=1)
        assert int(it_f) == tot_seq
        np.testing.assert_allclose(np.array(out_f), params, rtol=0, atol=1e-9)
