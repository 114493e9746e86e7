"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key counters across micro-batches — the streaming analogue
of the reference's batch progress counters (reference
src/ui/MainWindow.cpp:2003-2011: in-flight/finished counts surviving
across completions). State is a single (count, chars) tuple per key;
output mode 'update' emits the new running totals whenever a key sees
data in a micro-batch.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    stream: DataFrame,
    key_col: str = "source",
    len_col: str | None = "n_chars",
) -> DataFrame:
    """stream grouped by key -> (key, running_docs, running_chars)."""

    def update(
        key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        docs, chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            docs += len(pdf)
            if len_col is not None and len_col in pdf.columns:
                chars += int(pdf[len_col].fillna(0).sum())
        state.update((docs, chars))
        yield pd.DataFrame(
            {key_col: [key[0]], "running_docs": [docs], "running_chars": [chars]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, running_docs long, running_chars long",
        stateStructType="docs long, chars long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
