"""Boto3Transport unit tests (S6) — the transport's request shaping, partial
-failure mapping, and retry classification, verified against a fake client
with the real ``put_records`` response shape (no boto3/AWS in the sandbox;
the reference proves the same contract against localstack,
it/.../KinesisSuite.scala:283-302).

Parity target: with the same producer config, the fake-client path must
deliver the identical record multiset as ``LocalDirTransport`` — same
packing, same TTL retry, same escalation.
"""

from __future__ import annotations

import base64
import json
import os
import uuid

import pytest

from reactive_kinesis_spark.config import ProducerConfig
from reactive_kinesis_spark.streaming.aws import (
    MAX_RECORDS_PER_REQUEST,
    Boto3Transport,
    TransportError,
)
from reactive_kinesis_spark.streaming.sink import LocalDirTransport, write_batch
from tests.test_streaming import make_events


def _make_fakes():
    """Define the fakes in function scope so cloudpickle serializes them BY
    VALUE (a top-level test-module class is pickled by reference and Spark's
    Python workers cannot import ``test_aws_transport``)."""

    class FakeClientError(Exception):
        """botocore.exceptions.ClientError shape (duck-typed ``.response``)."""

        def __init__(self, code: str):
            super().__init__(code)
            self.response = {"Error": {"Code": code}}

    class FakeKinesisClient:
        """In-memory ``put_records`` with the real response shape. ``spool``
        makes it executor-safe: each request appends one JSON-lines file
        (local mode shares the filesystem), so driver-side asserts can read
        back what Spark tasks sent — same observability trick as
        LocalDirTransport."""

        def __init__(self, spool: str | None = None, fail_pks: tuple[str, ...] = (),
                     raise_code: str | None = None):
            self.spool = spool
            self.fail_pks = fail_pks
            self.raise_code = raise_code
            self.requests: list[list[dict]] = []  # in-process capture

        def put_records(self, StreamName: str, Records: list[dict]):
            if self.raise_code is not None:
                raise FakeClientError(self.raise_code)
            self.requests.append(Records)
            out = []
            for r in Records:
                if r["PartitionKey"] in self.fail_pks:
                    out.append({"ErrorCode": "ProvisionedThroughputExceededException",
                                "ErrorMessage": "throttled"})
                else:
                    out.append({"SequenceNumber": "1", "ShardId": "shardId-000000000000"})
            if self.spool:
                os.makedirs(self.spool, exist_ok=True)
                path = os.path.join(self.spool, f"{StreamName}-{uuid.uuid4().hex}.jsonl")
                with open(path, "w") as fh:
                    for r, res in zip(Records, out):
                        if "ErrorCode" not in res:
                            fh.write(json.dumps({
                                "pk": r["PartitionKey"],
                                "data": base64.b64encode(bytes(r["Data"])).decode("ascii"),
                            }) + "\n")
            return {"Records": out, "FailedRecordCount": sum("ErrorCode" in r for r in out)}

    return FakeClientError, FakeKinesisClient


FakeClientError, FakeKinesisClient = _make_fakes()


def _spool_read_back(spool: str) -> list[tuple[str, bytes]]:
    out = []
    for name in sorted(os.listdir(spool)):
        with open(os.path.join(spool, name)) as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    out.append((rec["pk"], base64.b64decode(rec["data"])))
    return out


def test_success_maps_to_all_true():
    client = FakeKinesisClient()
    t = Boto3Transport(client=client)
    assert t("s1", [("a", b"x"), ("b", b"y")]) == [True, True]
    assert client.requests == [[{"Data": b"x", "PartitionKey": "a"},
                                {"Data": b"y", "PartitionKey": "b"}]]


def test_partial_failure_maps_per_entry():
    t = Boto3Transport(client=FakeKinesisClient(fail_pks=("b",)))
    assert t("s1", [("a", b"x"), ("b", b"y"), ("c", b"z")]) == [True, False, True]


def test_whole_call_throttle_reports_all_failed_for_retry():
    t = Boto3Transport(client=FakeKinesisClient(raise_code="ProvisionedThroughputExceededException"))
    assert t("s1", [("a", b"x"), ("b", b"y")]) == [False, False]


def test_non_retryable_error_escalates():
    t = Boto3Transport(client=FakeKinesisClient(raise_code="ResourceNotFoundException"))
    with pytest.raises(TransportError, match="ResourceNotFoundException"):
        t("s1", [("a", b"x")])


def test_request_shape_guards():
    t = Boto3Transport(client=FakeKinesisClient())
    with pytest.raises(TransportError, match="cap 500"):
        t("s1", [(str(i), b"x") for i in range(MAX_RECORDS_PER_REQUEST + 1)])
    with pytest.raises(TransportError, match="per-record cap"):
        t("s1", [("a", b"x" * (1024 * 1024 + 1))])
    big = b"x" * (900 * 1024)  # 6 × 900 KiB > 5 MiB total, each under 1 MiB
    with pytest.raises(TransportError, match="PutRecords cap"):
        t("s1", [(str(i), big) for i in range(6)])


def test_write_batch_parity_with_local_transport(spark, tmp_path):
    """Same config, same data: the boto3 path delivers the identical record
    multiset as LocalDirTransport, and every request honors the PutRecords
    caps (packing happens upstream, transport re-verifies)."""
    df = make_events(spark, 300, shards=4)
    conf = ProducerConfig(
        stream_name="s1", aggregation_enabled=False, collection_max_count=50
    )

    local_dir = str(tmp_path / "local")
    write_batch(df, conf, LocalDirTransport(local_dir))

    spool = str(tmp_path / "aws")
    write_batch(df, conf, Boto3Transport(client=FakeKinesisClient(spool=spool)))

    want = sorted(LocalDirTransport(local_dir).read_back())
    got = sorted(_spool_read_back(spool))
    assert got == want
    # ≤50 records per request (collection cap < API cap) — parity with the
    # LocalDirTransport cap test
    for name in os.listdir(spool):
        n = sum(1 for line in open(os.path.join(spool, name)) if line.strip())
        assert n <= 50


def test_write_batch_retries_failed_subset_until_ttl(spark, tmp_path):
    """A persistently-throttled pk exhausts RecordTtl and fails the batch —
    identical escalation contract as the LocalDirTransport TTL test."""
    df = make_events(spark, 10, shards=1)
    conf = ProducerConfig(stream_name="s1", aggregation_enabled=False, record_ttl_millis=200)
    transport = Boto3Transport(client=FakeKinesisClient(fail_pks=("0",)))
    with pytest.raises(Exception) as ei:
        write_batch(df, conf, transport)
    assert "RecordTtl" in str(ei.value) or "TransportError" in str(ei.value)


def test_endpoint_url_mapping():
    from reactive_kinesis_spark.streaming.aws import endpoint_url

    c = ProducerConfig(stream_name="s")
    assert endpoint_url(c) is None  # public regional endpoint (KPL default)
    c = ProducerConfig(stream_name="s", kinesis_endpoint="localhost", kinesis_port=4567)
    assert endpoint_url(c) == "https://localhost:4567"
    c = ProducerConfig(stream_name="s", kinesis_endpoint="http://localstack", kinesis_port=4566)
    assert endpoint_url(c) == "http://localstack:4566"
    # host already carrying a port (localstack convention) keeps it —
    # KinesisPort must NOT be appended a second time
    c = ProducerConfig(stream_name="s", kinesis_endpoint="localhost:4566")
    assert endpoint_url(c) == "https://localhost:4566"
    c = ProducerConfig(stream_name="s", kinesis_endpoint="http://localhost:4566", kinesis_port=443)
    assert endpoint_url(c) == "http://localhost:4566"


def test_transient_network_exceptions_are_retryable():
    """botocore network failures (ReadTimeoutError / ConnectTimeoutError /
    EndpointConnectionError) carry no AWS error code — they must map to
    all-failed (retry within RecordTtl), not escalate, matching the KPL's
    treatment of transient network errors."""

    class ReadTimeoutError(Exception):  # botocore.exceptions shape: no .response
        pass

    class EndpointConnectionError(Exception):
        pass

    class FakeFlakyClient:
        def __init__(self, exc):
            self.exc = exc
            self.calls = 0

        def put_records(self, StreamName, Records):
            self.calls += 1
            raise self.exc

    for exc in (ReadTimeoutError("timed out"), EndpointConnectionError("refused")):
        t = Boto3Transport(client=FakeFlakyClient(exc))
        assert t("s1", [("a", b"x"), ("b", b"y")]) == [False, False]

    # a non-network uncoded exception still escalates
    t = Boto3Transport(client=FakeFlakyClient(ValueError("boom")))
    with pytest.raises(TransportError):
        t("s1", [("a", b"x")])


def test_credentials_provider_chain_names_map_to_default_chain():
    from reactive_kinesis_spark.streaming.aws import _profile_name

    assert _profile_name(None) is None
    assert _profile_name("DefaultAWSCredentialsProviderChain") is None
    assert _profile_name("com.amazonaws.auth.DefaultAWSCredentialsProviderChain") is None
    assert _profile_name("software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider") is None
    assert _profile_name("my-profile") == "my-profile"


def test_from_producer_config_with_injected_client():
    client = FakeKinesisClient()
    t = Boto3Transport.from_producer_config(
        ProducerConfig(stream_name="s", kinesis_endpoint="localhost"), client=client
    )
    assert t("s", [("a", b"x")]) == [True]


def test_owned_client_transport_pickles_for_executor_shipping():
    """write_batch ships the transport inside the foreachPartition closure;
    an owned (lazily-built) client must drop on pickle and rebuild, while
    an injected fake stays by-value."""
    import pickle

    t = Boto3Transport.from_producer_config(
        ProducerConfig(stream_name="s", kinesis_endpoint="localhost")
    )
    assert t._owns_client and t._client is None
    t2 = pickle.loads(pickle.dumps(t))
    assert t2._client is None
    assert t2._build_kwargs["endpoint_url"] == "https://localhost:443"

    injected = Boto3Transport(client=FakeKinesisClient())
    assert injected("s", [("a", b"x")]) == [True]  # no lazy build needed


def test_ssl_errors_fail_fast_and_ipv6_endpoints_get_ports():
    """TLS/certificate failures are permanent configuration errors, not
    transient network blips — they must escalate immediately; and bracketed
    IPv6 endpoint hosts still get KinesisPort appended."""
    from reactive_kinesis_spark.streaming.aws import (
        _is_transient_network_error,
        endpoint_url,
    )

    class ConnectionError_(Exception):
        pass

    class SSLError(ConnectionError_):
        pass

    class ReadTimeoutError(Exception):
        pass

    assert _is_transient_network_error(ReadTimeoutError())
    assert _is_transient_network_error(ConnectionError_())
    assert not _is_transient_network_error(SSLError())

    assert endpoint_url(ProducerConfig(stream_name="s", kinesis_endpoint="http://[::1]")) == "http://[::1]:443"
    assert endpoint_url(
        ProducerConfig(stream_name="s", kinesis_endpoint="http://[::1]:4566")
    ) == "http://[::1]:4566"
    assert endpoint_url(
        ProducerConfig(stream_name="s", kinesis_endpoint="localhost:4566")
    ) == "https://localhost:4566"
