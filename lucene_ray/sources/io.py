"""Dataset read helpers.

``read_parquet_clean`` strips pandas-writer schema metadata right at the
read: pyarrow Schemas carrying a ``b'pandas'`` metadata dict are UNHASHABLE,
which defeats Ray Data's block-schema deduplication (`set(schemas)` in
transform_pyarrow.unify_schemas) and spams every shuffle/reduce task with
"Failed to hash the schemas (for deduplication): unhashable type: 'dict'".
The strip is zero-copy (buffers are shared; only the schema object changes).
"""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def read_parquet_clean(paths, **kwargs):
    import ray.data

    ds = ray.data.read_parquet(paths, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
