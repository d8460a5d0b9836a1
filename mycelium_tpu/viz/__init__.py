from .plots import (plot_force_displacement, plot_growth_summary,
                    plot_mycelium, plot_network, plot_snapshot_csv)

__all__ = ["plot_mycelium", "plot_network", "plot_growth_summary",
           "plot_force_displacement", "plot_snapshot_csv"]
