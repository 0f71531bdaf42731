"""Small Arrow interop helpers shared by batch kernels."""

from __future__ import annotations

import pyarrow as pa


def from_pandas_clean(df, preserve_index: bool = False) -> pa.Table:
    """``pa.Table.from_pandas`` without the pandas schema metadata.

    The attached ``b'pandas'`` metadata blob holds dicts that defeat
    Ray Data's schema-deduplication hash (it logs "Failed to hash the
    schemas ... unhashable type: 'dict'" per block and re-ships the
    schema), so strip it — kernels only care about the columns."""
    return pa.Table.from_pandas(df, preserve_index=preserve_index).replace_schema_metadata(
        None
    )
