"""Worker-loss fault tolerance: an actor-pool stage whose first actor
hard-dies mid-run (os._exit — a real process loss, not a Python
exception) must still produce the complete, bit-identical result via
Ray's task retry + actor restart. This is the single-node stand-in
for losing a node mid-job on a 256-node run.

The chaos class is defined INSIDE the test so cloudpickle ships it by
value — pytest test modules are not importable on Ray workers (see
NOTES.md), and an actor RESTART re-deserializes the class on a fresh
worker."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import ray.data


class TestWorkerLoss:
    def test_actor_death_is_transparent(self):
        class _DieOnce:
            """Doubles v; the FIRST call across the whole pool kills
            its worker process (marker file makes it exactly-once)."""

            def __init__(self, marker: str) -> None:
                self.marker = marker

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                try:
                    fd = os.open(
                        self.marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                    )
                    os.close(fd)
                    os._exit(1)  # simulate node loss
                except FileExistsError:
                    pass
                return pd.DataFrame({"v2": b["v"].to_numpy(np.int64) * 2})

        marker = os.path.join(tempfile.mkdtemp(prefix="chaos_"), "died_once")
        n = 5000
        df = pd.DataFrame({"v": np.arange(n, dtype=np.int64)})
        ds = ray.data.from_pandas(df).repartition(8)
        out = ds.map_batches(
            _DieOnce,
            fn_constructor_kwargs={"marker": marker},
            batch_format="pandas",
            concurrency=2,
        ).to_pandas()
        assert os.path.exists(marker)  # the death really happened
        got = np.sort(out["v2"].to_numpy())
        assert len(got) == n
        assert (got == np.arange(n, dtype=np.int64) * 2).all()
