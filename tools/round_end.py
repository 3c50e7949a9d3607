#!/usr/bin/env python
"""End-of-round gate: run BEFORE the snapshot commit, never after.

Exists because round 9 shipped a snapshot with a red test suite — nothing
mechanical forced a full-suite run between "last code commit" and
"end-of-round". This script is that mechanism. It:

1. refuses to run on a dirty tree (commit your code first — the artifacts
   this writes must be the ONLY diff, so the snapshot provably matches
   what was tested);
2. runs the full pytest suite, teeing the output to ``PYTEST_r{N}.txt``,
   and FAILS on any test failure;
3. regenerates ``PLANS.md`` via ``tools/plan_report.py`` (stdout only —
   stderr must not leak into the file);
4. cross-checks the registry count against the PLANS.md row count and the
   README.md / COVERAGE.md "N registered / M oracle" literals, failing on
   any disagreement (the drifting-docs failure mode of rounds 7-9);
5. verifies the driver window was ROTATED: the first-50 registry window
   must not equal the previous round's CORRECTNESS key set (the round-9
   failure mode — a wasted certification run re-proving last round's
   rows), and every "N oracle"/"N-oracle" literal inside
   ``queries/__init__.py`` must match the live oracle count (the
   round-10 stale-comment finding, made mechanical);
6. enforces the RE-PROOF policy (the q183/q189 precedent, r13 verdict
   Next #8): any query whose evaluated oracle text or registration
   source differs from the committed ``QUERY_MANIFEST.json`` stamp must
   occupy a window slot this round, then re-stamps the manifest.

Usage: python tools/round_end.py <round_number>
Exit 0 = the tree is snapshot-ready; commit the written artifacts.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fail(msg: str) -> None:
    print(f"ROUND_END FAIL: {msg}", file=sys.stderr)
    sys.exit(1)


def compute_query_manifest(registry) -> dict[str, str]:
    """Per-query change fingerprint: sha256 over the EVALUATED oracle
    text (builders may be refactored freely as long as the emitted bytes
    hold) plus the query function's source. Scope note: edits to shared
    operator code a query calls are NOT captured — the manifest tracks
    the registration site, which is where oracle text and query shape
    live; operator-level changes are covered by the full local parity
    suite every session."""
    import hashlib
    import inspect

    out = {}
    for name, qd in registry.items():
        try:
            src = inspect.getsource(qd.fn)
        except OSError:  # pragma: no cover — source always on disk here
            src = ""
        blob = (qd.oracle or "") + "\x00" + src
        out[name] = hashlib.sha256(blob.encode("utf-8")).hexdigest()
    return out


def check_reproof_policy(
    registry, manifest_path: str
) -> tuple[list[str], dict[str, str]]:
    """The q183/q189 re-proof policy, made mechanical (r13 verdict Next
    #8): any registry entry whose oracle text or query source changed
    since QUERY_MANIFEST.json was last stamped must appear in the
    current 50-slot driver window — a green hash row proves the text
    that produced it, so a changed query with only an old green row is
    uncertified until re-proven. Returns ``(violations, live_manifest)``
    where violations = changed-or-new entries missing from the window.
    A missing manifest file (first run) yields no violations — the
    stamp written at this round's end becomes the baseline."""
    import json

    live = compute_query_manifest(registry)
    if not os.path.exists(manifest_path):
        return [], live
    with open(manifest_path, encoding="utf-8") as fh:
        stamped = json.load(fh)
    window = set(list(registry)[:50])
    violations = [
        name
        for name, digest in live.items()
        if stamped.get(name) != digest and name not in window
    ]
    return sorted(violations), live


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        fail("usage: python tools/round_end.py <round_number>")
    rnd = int(sys.argv[1])

    # 1. clean tree (untracked files are fine; modified/staged are not —
    # the artifacts below must be the only diff the snapshot commit adds)
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--untracked-files=no"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    if dirty:
        fail(f"dirty tree — commit code changes first:\n{dirty}")

    # 2. full suite -> PYTEST_r{N}.txt; red suite = hard stop
    pytest_out = os.path.join(REPO, f"PYTEST_r{rnd:02d}.txt")
    with open(pytest_out, "w", encoding="utf-8") as fh:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            cwd=REPO,
            stdout=fh,
            stderr=subprocess.STDOUT,
        )
    tail = open(pytest_out, encoding="utf-8").read().strip().splitlines()
    print("\n".join(tail[-5:]))
    if proc.returncode != 0:
        fail(f"pytest exit {proc.returncode} — see {pytest_out}; fix before snapshot")

    # 3. PLANS.md — stdout IS the file; stderr stays on the console
    plans = os.path.join(REPO, "PLANS.md")
    with open(plans, "w", encoding="utf-8") as fh:
        proc = subprocess.run(
            [sys.executable, "tools/plan_report.py"], cwd=REPO, stdout=fh
        )
    if proc.returncode != 0:
        fail("plan_report.py failed — PLANS.md is incomplete, do not commit it")

    # 4. count consistency: registry vs PLANS.md vs README/COVERAGE literals
    from reactive_kinesis_spark.queries import load_all

    registry = load_all()
    n_total = len(registry)
    n_oracle = sum(1 for q in registry.values() if q.oracle)
    plan_rows = sum(
        1 for line in open(plans, encoding="utf-8") if re.match(r"^\| q\d", line)
    )
    if plan_rows != n_total:
        fail(f"PLANS.md has {plan_rows} query rows; registry has {n_total}")
    readme = open(os.path.join(REPO, "README.md"), encoding="utf-8").read()
    if f"{n_total} queries, {n_oracle} with DuckDB oracles" not in readme:
        fail(
            f"README.md query-count literal is stale — expected "
            f"'{n_total} queries, {n_oracle} with DuckDB oracles'"
        )
    coverage = open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8").read()
    if f"{n_total} registered queries; {n_oracle} oracle-checked" not in coverage:
        fail(
            f"COVERAGE.md count literal is stale — expected "
            f"'{n_total} registered queries; {n_oracle} oracle-checked'"
        )

    # 5a. window rotation: the driver certifies the FIRST 50 entries; if
    # that set equals the previous round's CORRECTNESS keys, the round
    # re-proves last round's rows and the certification run is wasted
    # (the round-9 failure mode — flagged by the judge, now mechanical)
    window = list(registry)[:50]
    prev_path = os.path.join(REPO, f"CORRECTNESS_r{rnd - 1:02d}.json")
    if os.path.exists(prev_path):
        import json

        with open(prev_path, encoding="utf-8") as fh:
            prev_keys = set(json.load(fh))
        overlap = sorted(set(window) & prev_keys)
        if set(window) == prev_keys:
            fail(
                f"driver window NOT rotated: the first-50 registry window "
                f"equals CORRECTNESS_r{rnd - 1:02d}'s key set — rewrite "
                "_WINDOW in queries/__init__.py before snapshotting"
            )
        print(
            f"# window rotation vs r{rnd - 1:02d}: {len(overlap)}/50 overlap "
            f"({', '.join(overlap[:6])}{'...' if len(overlap) > 6 else ''})"
        )

    # 5b. oracle-count literals inside queries/__init__.py: every
    # "N oracle..."/"N-oracle..." number must be the live count
    qinit = open(
        os.path.join(REPO, "reactive_kinesis_spark", "queries", "__init__.py"),
        encoding="utf-8",
    ).read()
    # negative lookbehind: "round-11 oracle graduations" is a ROUND
    # number, not a count — only match numbers that start their own word
    bad_counts = {
        m.group(1)
        for m in re.finditer(r"(?<![-\w])(\d+)[ -]oracle", qinit)
        if int(m.group(1)) != n_oracle
    }
    if bad_counts:
        fail(
            f"stale oracle-count literal(s) {sorted(bad_counts)} in "
            f"queries/__init__.py — live count is {n_oracle}"
        )

    # 5c. re-proof policy (r13 verdict Next #8): a query whose oracle
    # text or registration source changed since the last stamp must take
    # a window slot this round — its old green row proves the OLD text.
    manifest_path = os.path.join(REPO, "QUERY_MANIFEST.json")
    violations, live_manifest = check_reproof_policy(registry, manifest_path)
    if violations:
        fail(
            "changed-since-last-stamp queries missing from the driver "
            f"window (re-proof policy): {violations} — put them in "
            "_WINDOW or revert their oracle/source to the stamped bytes"
        )
    import json as _json

    with open(manifest_path, "w", encoding="utf-8") as fh:
        _json.dump(live_manifest, fh, indent=0, sort_keys=True)
    print(f"# re-proof policy clean; QUERY_MANIFEST.json stamped ({len(live_manifest)} entries)")

    print(
        f"ROUND_END OK: suite green, PLANS.md {plan_rows} rows, "
        f"registry {n_total}/{n_oracle} matches README+COVERAGE, window "
        f"rotated, __init__ literals current, re-proof manifest stamped. "
        f"Commit PYTEST_r{rnd:02d}.txt, PLANS.md and QUERY_MANIFEST.json."
    )


if __name__ == "__main__":
    main()
