from .readers import read_mesh, read_mesh_dir
from .writers import (
    export_geometry,
    write_fea_records,
    write_growth_stats,
    write_snapshot_csv,
)

__all__ = [
    "read_mesh", "read_mesh_dir", "export_geometry",
    "write_fea_records", "write_growth_stats", "write_snapshot_csv",
]
