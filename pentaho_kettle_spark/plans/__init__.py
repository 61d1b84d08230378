from pentaho_kettle_spark.plans.explain import count_shuffles, plan_summary  # noqa: F401
