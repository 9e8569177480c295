from .io import TABLES, load, table_path  # noqa: F401
