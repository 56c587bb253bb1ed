"""Physical-plan selection layer (SURVEY.md §4)."""

from knowhere_spark.plans.planner import (
    PlanDecision,
    decide_search_plan,
    search_widening,
    search_with_fallback,
)

__all__ = [
    "PlanDecision",
    "decide_search_plan",
    "search_widening",
    "search_with_fallback",
]
