"""Report-rendering boundary (the reference's printed tables/plots
analog, pre_analysis.py:89-110,163-195): rendering consumes only
bounded aggregate frames and produces deterministic Markdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark import reporting as RP
from databricks_etl_spark.sources.readers import read_table


def test_quality_report_markdown_sections(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders")
    md = RP.quality_report_markdown(
        o,
        title="orders",
        integrity_checks={"o_totalprice": F.col("o_totalprice") > 0},
        count_cols=["o_orderstatus"],
        hist_cols=["o_totalprice"],
    )
    assert "# Data-quality report — orders" in md
    assert "### pct_complete" in md and "### pct_unique" in md
    assert "### pct_valid" in md
    assert "### value counts: o_orderstatus" in md
    assert "### histogram: o_totalprice" in md
    # completeness of a NOT NULL key column renders as 100.00 + full bar
    assert "| o_orderkey | 100.00 | ██████████████████████████████ |" in md
    # deterministic: rendering twice yields identical text
    md2 = RP.quality_report_markdown(
        o,
        title="orders",
        integrity_checks={"o_totalprice": F.col("o_totalprice") > 0},
        count_cols=["o_orderstatus"],
        hist_cols=["o_totalprice"],
    )
    assert md == md2


def test_report_save_and_degenerate_inputs(spark, tmp_path):
    empty = spark.createDataFrame([], "a long, b string")
    md = RP.quality_report_markdown(empty, title="empty")
    assert "rows: **0**" in md  # no crash, no fabricated 100%s
    assert "100.00" not in md
    hist = RP.render_histogram(empty, "a")
    assert "(no data)" in hist
    p = tmp_path / "report.md"
    RP.save_report(md, str(p))
    assert p.read_text().startswith("# Data-quality report — empty")
