from cloud_data_quality_spark.compiler.dialect import bq_to_spark_sql


def test_regexp_contains():
    assert bq_to_spark_sql(
        "REGEXP_CONTAINS( CAST( value AS STRING), '^[a-z]+$' )"
    ) == "(CAST( value AS STRING) RLIKE '^[a-z]+$')"


def test_countif_safe_divide_ifnull():
    out = bq_to_spark_sql(
        "ifnull(safe_divide(countif(x in ('M','F')), count(*)), cast('inf' as float64))")
    assert out == ("coalesce(try_divide(count_if(x in ('M','F')), count(*)), "
                   "CAST('Infinity' AS DOUBLE))")


def test_parse_date():
    assert bq_to_spark_sql("parse_date('%Y%m', month_id)") == \
        "to_date(month_id, 'yyyyMM')"


def test_timestamp_sub():
    assert bq_to_spark_sql(
        "ts >= timestamp_sub(current_timestamp(), interval 24 hour)") == \
        "ts >= (current_timestamp() - INTERVAL 24 hour)"


def test_date_sub_and_trunc():
    assert bq_to_spark_sql("date_sub(current_date(), interval 7 day)") == \
        "date_sub(current_date(), 7)"
    assert bq_to_spark_sql("timestamp_trunc(ts, DAY)") == "date_trunc('DAY', ts)"


def test_int64_cast():
    assert bq_to_spark_sql("cast(x as int64)") == "cast(x as BIGINT)"
