"""Dump .explain("formatted") for named bench queries to
plans/<round>/<query>_<tag>.txt (the optimization-round plan
evidence). Round dir via $SPARK_GRAFT_PLANS_DIR (default r16).

Usage: python scripts/capture_plans.py <tag> [sf_dir] name [name...]
"""
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ), args

    from dask_spark.queries import REGISTRY
    from dask_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", "r16"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} chars)")
        except Exception as exc:
            print(f"# {name} FAILED: {type(exc).__name__}: {exc}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
