"""Registration trace recorder.

Equivalent of the reference's Trace module
(src/obvision/registration/Trace.{h,cpp}): records the model, the scene,
and per-iteration transformed scenes / pair assignments / scores, then
serializes them to gnuplot-ready `.dat` files plus a plot script
(Trace.cpp:144-390: `model.dat`, `scene.dat`, `scene_NNN.dat`,
`pairs_NNN.dat`, `score.dat`, `trace.gpi`).

Functional redesign: where the reference mutates a Trace object from
inside Icp::step / the RANSAC matchers (forcing single-threaded
execution, RandomNormalMatching.cpp:209-216), the jitted kernels here
already *return* their per-iteration history (IcpResult.rms_history /
pair_history); this module is the host-side sink that collects those
pytrees and writes the same artifact layout — no effect on device code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np


@dataclass
class Trace:
    """Host-side trace collector (Trace.h:30-120)."""

    dim: int = 2
    _model: Optional[np.ndarray] = None
    _scene: Optional[np.ndarray] = None
    _scenes: List[np.ndarray] = field(default_factory=list)
    _pairs: List[np.ndarray] = field(default_factory=list)
    _scores: List[float] = field(default_factory=list)

    def reset(self) -> None:
        """Trace::reset (Trace.cpp:57-79)."""
        self._model = None
        self._scene = None
        self._scenes.clear()
        self._pairs.clear()
        self._scores.clear()

    def set_model(self, model, mask=None) -> None:
        """Trace::setModel (Trace.cpp:81-100)."""
        m = np.asarray(model)
        if mask is not None:
            m = m[np.asarray(mask)]
        self._model = m

    def set_scene(self, scene, mask=None) -> None:
        """Trace::setScene (Trace.cpp:102-121)."""
        s = np.asarray(scene)
        if mask is not None:
            s = s[np.asarray(mask)]
        self._scene = s

    def add_assignment(self, scene, pairs=None, score: float = 0.0) -> None:
        """Trace::addAssignment (Trace.cpp:123-142): one iteration's
        transformed scene, its (model_idx, scene_idx) pair array, and a
        scalar score."""
        self._scenes.append(np.asarray(scene))
        self._pairs.append(
            np.asarray(pairs) if pairs is not None
            else np.zeros((0, 2), np.int32))
        self._scores.append(float(score))

    def add_icp_history(self, scene0: np.ndarray, result) -> None:
        """Record a whole IcpResult history (the functional analogue of
        the per-step hook at Icp.cpp:430-444).

        When the ICP ran with IcpParams.record_pairs, the per-iteration
        (model_idx, scene_idx) pair assignments are recorded too
        (Trace::addAssignment's pair payload)."""
        rms = np.asarray(result.rms_history)
        idx_h = result.pair_idx_history
        mask_h = result.pair_mask_history
        for i in range(rms.shape[0]):
            if np.isnan(rms[i]):
                break
            pairs = None
            if idx_h is not None and mask_h is not None:
                m = np.asarray(mask_h[i])
                pairs = np.stack([np.asarray(idx_h[i])[m],
                                  np.nonzero(m)[0]], axis=1)
            self.add_assignment(scene0, pairs, float(rms[i]))

    # -- serialization ------------------------------------------------------
    def serialize(self, folder: str) -> None:
        """Trace::serialize (Trace.cpp:144-390): write model/scene/
        per-iteration data + a gnuplot script into a new folder."""
        os.makedirs(folder, exist_ok=True)
        if self._model is not None:
            np.savetxt(os.path.join(folder, "model.dat"), self._model,
                       fmt="%.6f")
        if self._scene is not None:
            np.savetxt(os.path.join(folder, "scene.dat"), self._scene,
                       fmt="%.6f")
        for i, (sc, pr) in enumerate(zip(self._scenes, self._pairs)):
            np.savetxt(os.path.join(folder, f"scene_{i:03d}.dat"), sc,
                       fmt="%.6f")
            lines = []
            if pr.size and self._model is not None and sc.size:
                for mi, si in pr:
                    lines.append(self._model[mi])
                    lines.append(sc[si])
            np.savetxt(os.path.join(folder, f"pairs_{i:03d}.dat"),
                       np.asarray(lines).reshape(-1, self.dim)
                       if lines else np.zeros((0, self.dim)),
                       fmt="%.6f")
        np.savetxt(os.path.join(folder, "score.dat"),
                   np.asarray(self._scores), fmt="%.9f")
        self._write_gpi(folder)

    def _write_gpi(self, folder: str) -> None:
        n = len(self._scenes)
        lines = [
            "set terminal pngcairo size 800,800",
            "set size ratio -1",
        ]
        for i in range(n):
            lines += [
                f"set output 'trace_{i:03d}.png'",
                ("plot 'model.dat' u 1:2 w p pt 7 ps 0.4 t 'model', "
                 f"'scene_{i:03d}.dat' u 1:2 w p pt 7 ps 0.4 t 'scene', "
                 f"'pairs_{i:03d}.dat' u 1:2 w l lw 0.3 t 'pairs'"),
            ]
        with open(os.path.join(folder, "trace.gpi"), "w") as f:
            f.write("\n".join(lines) + "\n")
