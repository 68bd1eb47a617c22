"""The examples/tour.py walkthrough must stay runnable — it is the
doc-workflow parity proof (foreign tables, COPY, lakehouse lifecycle,
time travel, export + object-store discovery, spatial SQL, pipeline)."""

from __future__ import annotations


def test_tour_end_to_end(spark, tmp_path):
    from examples.tour import tour

    out = tour(spark, str(tmp_path))
    assert out["foreign_rows"] == 100
    assert out["lake_rows"] == 100
    assert out["after_dml"] == 67  # 33 'k2' rows deleted
    assert out["time_travel"] == 67
    assert out["discovered_rows"] == 67
    assert out["catalog_tables"] == 1
    assert out["inspected_rows"] >= 67  # live data rows per the manifests
    assert out["evolved_cols"] == ["user_id", "kind", "amount", "source"]
    assert out["intersection_area"] == 25.0 and out["contains"] is True
    assert out["dupes_found"] == 200  # every probe body repeats a corpus body
    assert out["shards"] == 4
