"""Environment capability probes.

Some engine operators depend on optional runtime pieces that a minimal
PySpark install may not ship. Each probe returns ``(available, reason)``
where ``reason`` documents exactly what is missing and how to enable it —
callers (and the test suite's skip markers) surface the reason verbatim, so
"skipped" is always a stated environment capability, never a silent default.
"""

from __future__ import annotations


def transform_with_state() -> tuple[bool, str]:
    """Can ``transformWithStateInPandas`` run here?

    Spark 4's arbitrary-stateful-processing API drives a Python-side state
    server whose wire protocol is protobuf
    (``pyspark.sql.streaming.proto``); the ``StatefulProcessor`` base class
    itself imports without it, so the absence only surfaces at query start.
    Probing protobuf up front turns that late worker crash into an explicit
    capability answer.
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as exc:
        return False, f"pyspark lacks the transformWithState API: {exc}"
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return (
            False,
            "transformWithStateInPandas requires the 'protobuf' package for "
            "its state-server protocol (pip install "
            "'reactive-kinesis-spark[tws]', or plain protobuf); "
            "applyInPandasWithState covers the same semantics without it",
        )
    return True, "transformWithStateInPandas available"
