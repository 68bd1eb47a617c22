

def test_iceberg_field_ids(spark, tmp_path):
    """iceberg_table_fieldids / pg_lake_get_leaf_field_ids parity:
    leaf name → field id, nested structs flattened with dotted paths."""
    from pg_lake_spark.lakehouse.iceberg_meta import export_iceberg, iceberg_field_ids
    from pg_lake_spark.lakehouse.table import LakeTable

    loc = str(tmp_path / "t")
    t = LakeTable.create_from_dataframe(
        spark, loc,
        spark.range(5).selectExpr("id AS k", "named_struct('a', id, 'b', CAST(id AS STRING)) AS nest"),
    )
    export_iceberg(t)
    ids = iceberg_field_ids(loc)
    assert ids["k"] >= 1
    assert "nest.a" in ids and "nest.b" in ids
    assert len(set(ids.values())) == len(ids)  # unique ids
