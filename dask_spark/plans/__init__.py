"""Plan introspection (reference: dask diagnostics/visualize →
Spark explain). Helpers assert the scale guardrails: pushdown, pruning,
broadcast, whole-stage codegen."""

from __future__ import annotations

import io
from contextlib import redirect_stdout


def plan_text(frame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        frame._sdf.explain(mode)
    return buf.getvalue()


def has_pushed_filters(frame) -> bool:
    txt = plan_text(frame)
    return "PushedFilters: [" in txt and "PushedFilters: []" not in txt


def read_schema_columns(frame) -> list[str]:
    """Columns actually read at the scan (pruning check)."""
    import re

    txt = plan_text(frame)
    m = re.search(r"ReadSchema: struct<([^>]*)>", txt)
    if not m:
        return []
    return [p.split(":")[0] for p in m.group(1).split(",") if p]


def uses_broadcast_join(frame) -> bool:
    return "BroadcastHashJoin" in plan_text(frame)


def codegen_stages(frame) -> int:
    """Distinct whole-stage-codegen spans (simple-mode ``*(n)`` ids —
    formatted mode would double-count tree nodes vs detail sections).

    Under AQE the pre-execution plan hides codegen decisions
    (isFinalPlan=false); execute once so explain shows the final
    adaptive plan."""
    import re

    txt = plan_text(frame, "simple")
    if "isFinalPlan=false" in txt:
        frame._sdf.collect()
        txt = plan_text(frame, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", txt)))


def estimated_size_bytes(frame) -> int:
    """Catalyst-estimated plan output size (dask memory_usage analog)."""
    return int(
        frame._sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def shuffle_count(frame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (simple mode: one line per operator). BroadcastExchange is excluded
    — it replicates a small side, it does not repartition data."""
    txt = plan_text(frame, "simple")
    return sum(
        1
        for line in txt.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reuse" not in line
    )


def partition_filters(frame) -> str:
    """The PartitionFilters clause at the scan (hive-partition pruning
    check — the 100 TB feature that turns a full-corpus scan into a
    directory-subtree read)."""
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan_text(frame))
    return m.group(1) if m else ""


def codegen_failure_lines(log_text: str) -> list[str]:
    """Lines in a driver log that mark a SILENT whole-stage-codegen
    fallback: Janino compile failures (``ERROR CodeGenerator: Failed
    to compile``) and oversize-bytecode bailouts. These never fail the
    query — Spark quietly runs the stage interpreted, a ~10× constant
    factor that survives every correctness gate (round-6 finding:
    6,900-line generated processNext() on the k-means cell family).
    scripts/verify_local.py re-execs itself with stderr piped through
    this scanner so a fallback can never land unnoticed again."""
    hits = []
    for line in log_text.splitlines():
        if "CodeGenerator" in line and (
            "Failed to compile" in line or "failed to compile" in line
            or "ERROR CodeGenerator" in line
        ):
            hits.append(line.strip())
        elif "hugeMethodLimit" in line and "exceeds" in line:
            hits.append(line.strip())
        elif "Whole-stage codegen disabled" in line:
            # WholeStageCodegenExec's generic bailout WARN (covers
            # Janino method-split failures that never reach the
            # ERROR-level compile path)
            hits.append(line.strip())
        elif "grows beyond 64 KB" in line:
            # Janino oversize-method message, sometimes surfaced via
            # CodegenError WARNs rather than 'Failed to compile'
            hits.append(line.strip())
    return hits
