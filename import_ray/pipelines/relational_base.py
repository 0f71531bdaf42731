"""Shared readers/helpers for the relational pipeline modules.

Split from the original single-module ``relational.py`` (round-4
maintainability split); ``import_ray.pipelines.relational`` re-exports
everything, so external imports are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean




def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    # strip the files' embedded pandas metadata (dicts in it defeat Ray's
    # schema-dedup hash on every shuffle bundle); metadata-only, zero-copy
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )




def _read_pandas(sf_dir: str, table: str, columns=None) -> pd.DataFrame:
    """Driver-side read of a SMALL dimension table (broadcast side)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()




def _np() -> int:
    from import_ray.core.context import npartitions

    return npartitions()




def _np_for(ds) -> int:
    """Partitions sized to the (read-stage) dataset's metadata size —
    keeps shuffle aggregator pools proportional to data, capped at
    2×CPUs (core.context.data_nparts)."""
    from import_ray.core.context import data_nparts

    return data_nparts(ds)




def _cents(x: np.ndarray) -> np.ndarray:
    # round-half-away-from-zero, matching DuckDB's ROUND() (numpy's
    # np.round is banker's rounding and diverges on exact .5)
    y = x * 100.0
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)
