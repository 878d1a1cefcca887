"""The ``.hb`` language front-end: parse the reference's transformation
DSL and compile it onto the Pipeline API."""

from hobbes_spark.hb.parser import parse_program
from hobbes_spark.hb.compiler import compile_hb, run_hb
from hobbes_spark.hb.providers import resolve_source, run_hb_program

__all__ = [
    "parse_program",
    "compile_hb",
    "run_hb",
    "resolve_source",
    "run_hb_program",
]
