from .explain import assert_broadcast_join, assert_no_python_udf, assert_pushed_filters, plan_text

__all__ = [
    "plan_text",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_python_udf",
]
