from .inspect import explain_str, assert_pushed_filters, assert_no_python_in_plan, scan_read_schema

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_no_python_in_plan",
    "scan_read_schema",
]
