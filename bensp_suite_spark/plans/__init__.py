from .inspect import (  # noqa: F401
    PlanGateError,
    assert_broadcast_join,
    assert_no_python_udf,
    assert_partial_aggregation,
    assert_pushed_filter,
    assert_read_schema,
    count_exchanges,
    executed_plan,
    formatted_plan,
    gate_report,
)
