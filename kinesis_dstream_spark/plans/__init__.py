"""Logical-plan surface: the reference's JSON filter IR compiled to Spark."""

from kinesis_dstream_spark.plans.filter_ir import (  # noqa: F401
    compile_payload,
    compile_filter,
    compile_filter_groups,
    contacts_poll_payload,
)
