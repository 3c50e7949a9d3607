"""Standalone lease-consumer worker for the multi-process contention test
(tests/test_lease.py::test_multiprocess_kill9_failover_no_loss_no_dup).

Runs the REAL `_LiveStreamReader` read/commit loop — the exact code a
kinesis_live streaming query drives — against a shared localdir stream and
a shared lease store, appending every delivered (shard_id, sequence_number)
to a sink file (fsync'd before commit, so the parent's no-dup assertion is
honest across a kill -9). Argv: data_dir lease_path worker_id sink_file.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    data, lease, worker, sink = sys.argv[1:5]
    from reactive_kinesis_spark.streaming.live_source import _LiveStreamReader

    reader = _LiveStreamReader(
        {
            "streamname": "s",
            "transport": "localdir",
            "transportpath": data,
            "leasedir": lease,
            "workerid": worker,
            "failovertimemillis": "3000",
            "maxrecordsperbatch": "1000",
        }
    )
    offsets = reader.initialOffset()
    while True:
        rows, end = reader.read(offsets)
        rows = list(rows)
        if rows:
            with open(sink, "a") as fh:
                for row in rows:
                    # row[1] = shard_id, row[3] = sequence_number
                    fh.write(json.dumps([row[1], row[3]]) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
        reader.commit(end)
        offsets = end
        time.sleep(0.2)


if __name__ == "__main__":
    main()
