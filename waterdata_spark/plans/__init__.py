from waterdata_spark.plans.explain import assert_plan, plan_summary

__all__ = ["assert_plan", "plan_summary"]
