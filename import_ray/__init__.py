"""import_ray — Ray-Data-native Data Commons import / KG-construction engine."""

from __future__ import annotations


def _ensure_ray_worker_importable() -> None:
    """Ray workers resolve ``import_ray`` by module path, which works
    when the driver's cwd is the repo root. For drivers running
    elsewhere, ship the package by value via cloudpickle. Only runs when
    ray is already imported (any Ray-using driver imports ray first)."""
    import os
    import sys

    if "ray" not in sys.modules:
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.getcwd() == repo:
        return
    try:
        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_ensure_ray_worker_importable()
