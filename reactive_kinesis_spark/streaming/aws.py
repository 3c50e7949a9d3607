"""Real AWS Kinesis transport for the producer sink (S6 in SURVEY.md §2.1).

Completes the pluggable-transport seam (:data:`~reactive_kinesis_spark
.streaming.sink.Transport`): the packing / TTL-retry / throttling machinery
all lives transport-agnostically in ``write_batch`` — this module only maps
one PutRecords-shaped request onto ``boto3 kinesis.put_records`` and maps the
response back to per-entry success flags, exactly the contract
``LocalDirTransport`` implements for tests.

Reference semantics being mirrored (clean-room, from observable behavior):

* per-record send through the KPL with per-record success/failure futures
  (producer/KinesisProducer.scala:117-163 ``addUserRecord`` →
  ``UserRecordResult``);
* retryable service errors surface as failed records that the TTL-bounded
  retry loop re-sends — only the FAILED subset is retried
  (reference.conf:325-343 RecordTtl; PutRecords partial-failure contract);
* non-retryable errors (validation, missing stream, auth) escalate
  immediately — the reference's ``SendFailed`` ⇒ stage failure
  (KinesisSinkGraphStage.scala:138-148).

boto3 is NOT a dependency of this package (and absent in the test sandbox):
the import is deferred to construction time, and everything above the raw
client call is unit-tested against a fake client with the same response
shape (tests/test_streaming.py::TestBoto3Transport).
"""

from __future__ import annotations

from reactive_kinesis_spark.streaming.sink import TransportError

#: AWS error codes that mean "try the same records again" — the service is
#: shedding load or momentarily unavailable, not rejecting the request.
RETRYABLE_ERROR_CODES = frozenset(
    {
        "ProvisionedThroughputExceededException",
        "InternalFailure",
        "InternalError",
        "ServiceUnavailable",
        "ServiceUnavailableException",
        "ThrottlingException",
        "RequestTimeout",
        "LimitExceededException",
    }
)

#: PutRecords API hard limits (public AWS contract). ``RequestPacker``
#: enforces these upstream; the transport re-checks so a packing bug fails
#: loudly here instead of as an opaque AWS ValidationException.
MAX_RECORDS_PER_REQUEST = 500
MAX_REQUEST_BYTES = 5 * 1024 * 1024
MAX_RECORD_BYTES = 1024 * 1024  # 1 MiB data+partition-key per record

#: KPL ``CredentialsProvider`` values that mean "use the ambient default AWS
#: credential chain" (reference.conf:87-95 defaults to the Java SDK's
#: DefaultAWSCredentialsProviderChain). boto3's equivalent is simply NOT
#: naming a profile — passing such a class name as ``profile_name`` would
#: raise ProfileNotFound at session build. Any other value is treated as a
#: boto3/botocore named profile (the closest Python-native analog).
DEFAULT_CREDENTIALS_CHAIN_NAMES = frozenset(
    {
        "DefaultAWSCredentialsProviderChain",
        "com.amazonaws.auth.DefaultAWSCredentialsProviderChain",
        "DefaultCredentialsProvider",
        "software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider",
    }
)


def _profile_name(credentials_provider: str | None) -> str | None:
    """Map the KPL ``CredentialsProvider`` knob to a boto3 profile name:
    default-chain class names (and None) → None = ambient default chain."""
    if (
        credentials_provider is None
        or credentials_provider in DEFAULT_CREDENTIALS_CHAIN_NAMES
    ):
        return None
    return credentials_provider


def endpoint_url(conf) -> str | None:
    """KinesisEndpoint/KinesisPort → a boto3 ``endpoint_url`` (None = the
    public regional endpoint, the KPL default). A bare host gets https; an
    explicit scheme (localstack-style ``http://localhost``) is preserved.
    A host that already carries a port (``localhost:4566``) keeps it —
    ``KinesisPort`` is only appended when the host has none. Bracketed
    IPv6 literals (``[::1]``) are full of colons; for them the port test
    is a ``]:`` suffix, not any colon."""
    host = conf.kinesis_endpoint
    if not host:
        return None
    if "://" not in host:
        host = f"https://{host}"
    scheme, _, rest = host.partition("://")
    has_port = "]:" in rest if rest.startswith("[") else ":" in rest
    if has_port:
        return host
    return f"{host}:{conf.kinesis_port}"


def build_kinesis_client(
    *,
    region_name: str | None = None,
    endpoint_url: str | None = None,
    profile_name: str | None = None,
    verify=None,
    client_config_kwargs: dict | None = None,
    requirer: str = "this transport",
):
    """The one place a real boto3 Kinesis client is constructed — shared by
    the producer (:class:`Boto3Transport`) and consumer
    (:class:`~reactive_kinesis_spark.streaming.consumer_aws
    .Boto3GetRecordsTransport`) transports so session/endpoint/TLS/retry
    configuration can never diverge between the read and write paths."""
    try:
        import boto3
        from botocore.config import Config
    except ImportError as exc:  # pragma: no cover — import-guarded for sandboxes
        raise ImportError(
            f"{requirer} requires boto3 (pip install boto3); in tests "
            "inject a fake client via the client= parameter"
        ) from exc
    session = boto3.session.Session(profile_name=profile_name, region_name=region_name)
    extra: dict = {}
    if verify is not None:
        extra["verify"] = verify
    if client_config_kwargs:
        extra["config"] = Config(**client_config_kwargs)
    return session.client("kinesis", endpoint_url=endpoint_url, **extra)


def _aws_error_code(exc: BaseException) -> str | None:
    """Extract the AWS error code from a botocore ClientError (duck-typed so
    the module needs no botocore import)."""
    response = getattr(exc, "response", None)
    if isinstance(response, dict):
        code = response.get("Error", {}).get("Code")
        if isinstance(code, str):
            return code
    return None


def _is_transient_network_error(exc: BaseException) -> bool:
    """botocore network failures (ReadTimeoutError, ConnectTimeoutError,
    EndpointConnectionError, ConnectionClosedError, ...) carry no AWS error
    code — they never reached the service. They are transient by nature and
    the KPL retries them within RecordTtl (reference.conf:325-343), so the
    transport must classify them retryable too. Duck-typed on the exception
    class-name chain so the module needs no botocore import.

    TLS failures are the exception: botocore ``SSLError`` SUBCLASSES
    ConnectionError, but a certificate problem is a permanent configuration
    error — retrying it just burns the TTL budget masking the real cause,
    so it fails fast."""
    for klass in type(exc).__mro__:
        name = klass.__name__
        if "SSL" in name:
            return False
        if "Timeout" in name or "Connection" in name:
            return True
    return False


class Boto3Transport:
    """``Transport`` implementation over ``boto3`` ``kinesis.put_records``.

    Parameters
    ----------
    client:
        A pre-built Kinesis client (anything with a ``put_records`` method —
        tests inject a fake). When ``None``, a real boto3 client is built
        from the remaining kwargs.
    region_name / endpoint_url / profile_name:
        Standard boto3 session/client knobs; ``endpoint_url`` points the
        transport at localstack-style local endpoints, mirroring the
        reference's integration harness (it/.../KinesisSuite.scala:283-302
        runs against a local Kinesis endpoint the same way).

    Thread-safety: boto3 clients are thread-safe for concurrent calls, so
    this transport supports ``max_outstanding > 1`` in ``write_batch``.

    Pickling: ``write_batch`` ships the transport to executors inside the
    ``foreachPartition`` closure, and boto3 clients are not picklable — so
    client construction is LAZY (first ``__call__``) and an owned client is
    dropped on pickle and rebuilt per executor process. An injected client
    (tests, pre-configured sessions) is kept — fakes cloudpickle by value.
    """

    def __init__(
        self,
        client=None,
        *,
        region_name: str | None = None,
        endpoint_url: str | None = None,
        profile_name: str | None = None,
        verify=None,
        client_config_kwargs: dict | None = None,
    ):
        self._client = client
        self._owns_client = client is None
        self._build_kwargs = {
            "region_name": region_name,
            "endpoint_url": endpoint_url,
            "profile_name": profile_name,
            "verify": verify,
            "client_config_kwargs": client_config_kwargs,
        }

    def _ensure_client(self):
        if self._client is None:
            self._client = build_kinesis_client(
                **self._build_kwargs, requirer="Boto3Transport"
            )
        return self._client

    def __getstate__(self):
        state = dict(self.__dict__)
        if self._owns_client:
            state["_client"] = None  # rebuilt lazily after unpickle
        return state

    @classmethod
    def from_producer_config(cls, conf, client=None) -> "Boto3Transport":
        """Build the transport from a typed :class:`~reactive_kinesis_spark
        .config.ProducerConfig` — the connection knobs (KinesisEndpoint/
        KinesisPort/Region/VerifyCertificate/ConnectTimeout/RequestTimeout/
        MaxConnections/CredentialsProvider, reference.conf:87-378) map onto
        the boto3 client the way ``toAwsConfig`` maps them onto the native
        KPL (producer/KinesisProducerConfig.scala:63-106). Construction is
        lazy — nothing touches boto3 until the first send."""
        if client is not None:
            return cls(client=client)
        return cls(
            region_name=conf.region,
            endpoint_url=endpoint_url(conf),
            profile_name=_profile_name(conf.credentials_provider),
            verify=conf.verify_certificate,
            client_config_kwargs={
                "connect_timeout": conf.connect_timeout_millis / 1000.0,
                "read_timeout": conf.request_timeout_millis / 1000.0,
                "max_pool_connections": conf.max_connections,
            },
        )

    def __call__(self, stream_name: str, entries: list[tuple[str, bytes]]) -> list[bool]:
        self._check_request_shape(entries)
        records = [{"Data": data, "PartitionKey": pk} for pk, data in entries]
        try:
            resp = self._ensure_client().put_records(
                StreamName=stream_name, Records=records
            )
        except Exception as exc:  # noqa: BLE001 — classify, then retry or escalate
            code = _aws_error_code(exc)
            if code in RETRYABLE_ERROR_CODES or (
                code is None and _is_transient_network_error(exc)
            ):
                # whole-call throttle / transient network failure: report every
                # entry failed; the caller's TTL-bounded loop re-sends them
                # (failed-subset-only contract)
                return [False] * len(entries)
            raise TransportError(
                f"put_records to {stream_name!r} failed non-retryably"
                + (f" ({code})" if code else "")
            ) from exc
        out = resp.get("Records", [])
        if len(out) != len(entries):
            raise TransportError(
                f"put_records returned {len(out)} results for {len(entries)} records"
            )
        return [not r.get("ErrorCode") for r in out]

    @staticmethod
    def _check_request_shape(entries: list[tuple[str, bytes]]) -> None:
        if len(entries) > MAX_RECORDS_PER_REQUEST:
            raise TransportError(
                f"request has {len(entries)} records > PutRecords cap "
                f"{MAX_RECORDS_PER_REQUEST} — RequestPacker invariant broken"
            )
        total = 0
        for pk, data in entries:
            entry = len(data) + len(pk.encode("utf-8"))
            if entry > MAX_RECORD_BYTES:
                raise TransportError(
                    f"record for pk={pk!r} is {entry} B > per-record cap "
                    f"{MAX_RECORD_BYTES} — aggregation cap invariant broken"
                )
            total += entry
        if total > MAX_REQUEST_BYTES:
            raise TransportError(
                f"request is {total} B > PutRecords cap {MAX_REQUEST_BYTES} "
                f"— RequestPacker invariant broken"
            )
