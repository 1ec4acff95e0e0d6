from pycasselastic_spark.sources.registry import read_table, write_table

__all__ = ["read_table", "write_table"]
