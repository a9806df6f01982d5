"""Generate the registration-layer golden scenario (reg.txt) consumed by
golden/reg_harness.cpp, plus reg_inputs.npz with the identical arrays for
tests/test_reference_parity.py.

Datasets are scan-like: model points sampled along the walls of an
analytic room (with inward normals), scene = model displaced by the
inverse of a known SE(2) offset + deterministic noise — the shape of the
data ThreadLocalize feeds Icp (model = raycast surface points + normals,
scene = measured scan; ThreadLocalize.cpp:369-374,575-576).

Run via `make -C golden` (no reference code involved here).
"""

import sys

import numpy as np


def room_scan(n, seed, lo=1.0, hi=9.0):
    """Points along the perimeter of the [lo, hi]^2 room, with inward
    wall normals, ordered by angle from the room center (beam order)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4.0, n, endpoint=False) + rng.uniform(
        0.0, 0.5 / n, n)
    side = np.floor(t).astype(int)
    f = t - side
    w = hi - lo
    pts = np.zeros((n, 2))
    nrm = np.zeros((n, 2))
    pts[side == 0] = np.stack([lo + f[side == 0] * w,
                               np.full((side == 0).sum(), lo)], -1)
    nrm[side == 0] = (0.0, 1.0)
    pts[side == 1] = np.stack([np.full((side == 1).sum(), hi),
                               lo + f[side == 1] * w], -1)
    nrm[side == 1] = (-1.0, 0.0)
    pts[side == 2] = np.stack([hi - f[side == 2] * w,
                               np.full((side == 2).sum(), hi)], -1)
    nrm[side == 2] = (0.0, -1.0)
    pts[side == 3] = np.stack([np.full((side == 3).sum(), lo),
                               hi - f[side == 3] * w], -1)
    nrm[side == 3] = (1.0, 0.0)
    c = np.array([(lo + hi) / 2, (lo + hi) / 2])
    order = np.argsort(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]))
    return pts[order], nrm[order]


def se2(x, y, th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, x], [s, c, y], [0.0, 0.0, 1.0]])


def apply(T, pts):
    return pts @ T[:2, :2].T + T[:2, 2]


def fmt(a):
    return " ".join(f"{v:.17g}" for v in np.asarray(a).ravel())


def main(out_txt, out_npz):
    cases = []

    # dataset A: 400-point room scan, true offset (0.06, -0.04, 0.05)
    model_a, norm_a = room_scan(400, seed=1)
    T_true = se2(0.06, -0.04, 0.05)
    rng = np.random.default_rng(7)
    scene_a = apply(np.linalg.inv(T_true), model_a)
    scene_a = scene_a + rng.normal(0.0, 0.003, scene_a.shape)

    # dataset B: sparser scan, larger offset, partial overlap (clip a
    # quarter of the scene so the distance gate + reciprocal rule work)
    model_b, norm_b = room_scan(257, seed=3)
    T_b = se2(-0.12, 0.08, -0.09)
    scene_b = apply(np.linalg.inv(T_b), model_b)
    scene_b = scene_b + rng.normal(0.0, 0.005, scene_b.shape)
    scene_b = scene_b[: (3 * len(scene_b)) // 4]
    # outlier contamination (spurious returns) so the shrinking distance
    # gate actually rejects pairs over the iterations
    n_out = 18
    scene_b[::len(scene_b) // n_out] += rng.uniform(
        0.35, 1.6, (len(scene_b[::len(scene_b) // n_out]), 2)) * rng.choice(
        [-1.0, 1.0], (len(scene_b[::len(scene_b) // n_out]), 2))

    eye = np.eye(3)
    seed_T = se2(0.03, -0.02, 0.02)   # RANSAC-style pre-registration seed
    # OOB-prefilter pose + bounds chosen so a realistic border strip of
    # the transformed scene falls outside (partial masking, as when the
    # robot nears the grid edge)
    pose = se2(0.5, -0.4, 0.03)
    bounds = (1.2, 9.3, 1.2, 9.3)

    # (name, estimator, iters, maxrms, convcnt, dist(on,max,min,iters),
    #  rec, oob, pose, tinit, model, normals, scene)
    cases.append(("cf_full", "closed_form", 25, 0.0, 5,
                  (1, 1.0, 0.2, 25), 1, 1, pose, eye,
                  model_a, norm_a, scene_a))
    cases.append(("cf_seeded", "closed_form", 25, 0.0, 5,
                  (1, 1.0, 0.2, 25), 1, 0, pose, seed_T,
                  model_a, norm_a, scene_a))
    cases.append(("cf_distonly", "closed_form", 20, 0.0, 5,
                  (1, 0.8, 0.15, 20), 0, 0, pose, eye,
                  model_b, norm_b, scene_b))
    cases.append(("cf_nofilter", "closed_form", 15, 0.0, 5,
                  (0, 1.0, 0.2, 15), 0, 0, pose, eye,
                  model_b, norm_b, scene_b))
    cases.append(("p2l_full", "point_to_line", 25, 0.0, 5,
                  (1, 1.0, 0.2, 25), 1, 0, pose, eye,
                  model_a, norm_a, scene_a))
    cases.append(("p2l_partial", "point_to_line", 25, 0.0, 5,
                  (1, 0.8, 0.15, 25), 1, 0, pose, eye,
                  model_b, norm_b, scene_b))

    with open(out_txt, "w") as f:
        f.write(f"ncases {len(cases)}\n")
        for (name, est, iters, maxrms, conv, dist, rec, oob, pz, ti,
             m, n, s) in cases:
            f.write(f"case {name}\n")
            f.write(f"estimator {est}\n")
            f.write(f"params {iters} {maxrms:.17g} {conv}\n")
            f.write(f"distfilter {dist[0]} {dist[1]:.17g} "
                    f"{dist[2]:.17g} {dist[3]}\n")
            f.write(f"reciprocal {rec}\n")
            f.write(f"oob {oob} " + fmt(np.asarray(bounds)) + "\n")
            f.write("pose " + fmt(pz) + "\n")
            f.write("tinit " + fmt(ti) + "\n")
            f.write(f"model {len(m)}\n")
            for i in range(len(m)):
                f.write(fmt(np.concatenate([m[i], n[i]])) + "\n")
            f.write(f"scene {len(s)}\n")
            for i in range(len(s)):
                f.write(fmt(s[i]) + "\n")

    np.savez(
        out_npz,
        names=np.array([c[0] for c in cases]),
        **{f"{c[0]}.model": c[10] for c in cases},
        **{f"{c[0]}.normals": c[11] for c in cases},
        **{f"{c[0]}.scene": c[12] for c in cases},
        **{f"{c[0]}.tinit": c[9] for c in cases},
        **{f"{c[0]}.pose": c[8] for c in cases},
        **{f"{c[0]}.spec": np.array([
            c[2], c[3], c[4], c[5][0], c[5][1], c[5][2], c[5][3],
            c[6], c[7]]) for c in cases},
        bounds=np.asarray(bounds),
    )
    print(f"wrote {out_txt} and {out_npz}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
