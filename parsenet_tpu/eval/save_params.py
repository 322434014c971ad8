"""Serialize fitted primitive parameters + resampled surfaces.

Equivalent of reference src/primitives.py:209-386 (SaveParameters): store the
per-segment fitted parameters of a shape to h5 and regenerate dense surface
samples / meshes from them for visualization or downstream CAD export.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import sampling
from ..ops.primitive_fits import AllPrimParams
from ..postprocess import tessellate_grid, trim_mesh_by_distance, write_ply
from ..postprocess.meshing import remove_unreferenced

GEOM_NAMES = {0: "plane", 1: "sphere", 2: "cylinder", 3: "cone"}


def params_to_dict(params: AllPrimParams, geom_type: np.ndarray,
                   valid: np.ndarray, spline_surfaces: Optional[np.ndarray]
                   = None, spline_slots: Optional[np.ndarray] = None) -> Dict:
    """Flatten the per-segment fitted parameters into a plain dict of numpy
    arrays keyed like the reference's SaveParameters.save layout."""
    out = {
        "geom_type": np.asarray(geom_type),
        "valid": np.asarray(valid),
        "plane_normal": np.asarray(params.plane.normal),
        "plane_offset": np.asarray(params.plane.offset),
        "sphere_center": np.asarray(params.sphere.center),
        "sphere_radius": np.asarray(params.sphere.radius),
        "cylinder_axis": np.asarray(params.cylinder.axis),
        "cylinder_center": np.asarray(params.cylinder.center),
        "cylinder_radius": np.asarray(params.cylinder.radius),
        "cone_apex": np.asarray(params.cone.apex),
        "cone_axis": np.asarray(params.cone.axis),
        "cone_theta": np.asarray(params.cone.theta),
    }
    if spline_surfaces is not None:
        out["spline_surfaces"] = np.asarray(spline_surfaces)
        out["spline_slots"] = np.asarray(spline_slots)
    return out


def save_h5(path: str, shape_params: Dict) -> None:
    import h5py
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as hf:
        for k, v in shape_params.items():
            hf.create_dataset(k, data=v)


def load_h5(path: str) -> Dict:
    import h5py
    out = {}
    with h5py.File(path, "r") as hf:
        for k in hf.keys():
            out[k] = np.array(hf[k])
    return out


def resample_segment_surface(shape_params: Dict, k: int,
                             seg_points: np.ndarray,
                             grid: int = 48) -> np.ndarray:
    """Dense samples of segment k's fitted surface (reference:
    SaveParameters.load_parameters resamples for viz)."""
    t = int(shape_params["geom_type"][k])
    m = jnp.ones(len(seg_points))
    pts = jnp.asarray(seg_points)
    if t == 0:
        s = sampling.sample_plane(jnp.asarray(shape_params["plane_normal"][k]),
                                  jnp.asarray(shape_params["plane_offset"][k]),
                                  pts, m, grid)
    elif t == 1:
        s = sampling.sample_sphere(jnp.asarray(shape_params["sphere_center"][k]),
                                   jnp.asarray(shape_params["sphere_radius"][k]),
                                   grid)
    elif t == 2:
        s = sampling.sample_cylinder(
            jnp.asarray(shape_params["cylinder_axis"][k]),
            jnp.asarray(shape_params["cylinder_center"][k]),
            jnp.asarray(shape_params["cylinder_radius"][k]), pts, m, grid)
    elif t == 3:
        s = sampling.sample_cone(jnp.asarray(shape_params["cone_apex"][k]),
                                 jnp.asarray(shape_params["cone_axis"][k]),
                                 jnp.asarray(shape_params["cone_theta"][k]),
                                 pts, m, grid)
    else:
        raise ValueError(f"segment {k} is not geometric (type {t})")
    return np.asarray(s)


def export_shape_meshes(shape_params: Dict, points: np.ndarray,
                        labels: np.ndarray, out_dir: str,
                        epsilon: float = 0.05, grid: int = 48) -> List[str]:
    """Write one epsilon-trimmed PLY mesh per valid segment (reference:
    src/fitting_utils.py:713-820 visualize_bit_mapping_shape)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for k in np.where(shape_params["valid"])[0]:
        seg_pts = points[labels == k]
        if len(seg_pts) < 20:
            continue
        t = int(shape_params["geom_type"][k])
        if t < 0:
            continue
        surf = resample_segment_surface(shape_params, int(k), seg_pts, grid)
        v, tris = tessellate_grid(surf, grid, grid, wrap_u=t in (2, 3))
        tris = trim_mesh_by_distance(v, tris, seg_pts, epsilon)
        if not len(tris):
            continue
        v2, tris2 = remove_unreferenced(v, tris)
        p = os.path.join(out_dir, f"segment_{k}_{GEOM_NAMES.get(t, t)}.ply")
        write_ply(p, v2, tris2)
        paths.append(p)
    return paths
