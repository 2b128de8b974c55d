from dataquality_spark.sources.read import read_data
from dataquality_spark.sources.xlsx import read_xlsx, read_xlsx_pdf, write_xlsx

__all__ = ["read_data", "read_xlsx", "read_xlsx_pdf", "write_xlsx"]
