"""Generic .explain('formatted') capture: one MODULE:FUNC with the
(spark, sf_dir) signature -> plans/r14/<out>.txt.

Usage: python probes/plan_capture_r14.py MODULE:FUNC OUT_NAME [sf_dir]
"""

from __future__ import annotations

import contextlib
import importlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spec, out_name = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    mod, fn_name = spec.split(":")
    fn = getattr(importlib.import_module(mod), fn_name)

    from df_to_azure_spark.session import get_spark

    spark = get_spark(app_name="plan_capture_r14")
    df = fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = Path(__file__).resolve().parent.parent / "plans" / "r14" / f"{out_name}.txt"
    out.write_text(f"== {spec} @ {sf_dir} ==\n" + buf.getvalue())
    print(f"wrote {out} ({buf.getvalue().count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
