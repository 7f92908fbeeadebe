from osmesa_spark.plans.audit import audit_plan, assert_scaleable  # noqa: F401
