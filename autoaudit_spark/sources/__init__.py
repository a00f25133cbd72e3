from .tables import TABLES, load_table, load_tables, load_csv_edges, edges, adjacency, EDGES_SQL, DST_MOD

__all__ = ["TABLES", "load_table", "load_tables", "load_csv_edges", "edges", "adjacency", "EDGES_SQL", "DST_MOD"]
