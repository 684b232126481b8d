"""Fault-tolerance: a map_batches worker process dying mid-run (the
100-TB cluster's routine event) must not fail the job or corrupt the
result — Ray reschedules the killed task and the pipeline completes
with byte-identical output."""

import os

import pyarrow as pa
import ray.data


def test_worker_death_is_retried_exactly(tmp_path):
    sentinel = str(tmp_path / "killed-once")

    def f(batch: pa.Table) -> pa.Table:
        # kill exactly ONE worker process, once, on the marked block:
        # os._exit bypasses Python teardown — to Ray this is a died
        # worker (system failure), which map tasks retry by default
        if 0 in batch["i"].to_pylist() and not os.path.exists(sentinel):
            with open(sentinel, "w") as fh:
                fh.write("x")
            os._exit(1)
        return pa.table(
            {
                "i": batch["i"],
                "double": pa.array(
                    [v * 2 for v in batch["i"].to_pylist()], pa.int64()
                ),
            }
        )

    ds = ray.data.from_arrow(
        pa.table({"i": pa.array(range(1000), pa.int64())})
    ).repartition(8)
    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert os.path.exists(sentinel)  # the kill really happened
    assert len(out) == 1000  # no lost rows
    assert out["double"].tolist() == [2 * i for i in range(1000)]
