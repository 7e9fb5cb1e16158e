from .tabular import read_tabular, read_parquet, read_orc, read_csv
