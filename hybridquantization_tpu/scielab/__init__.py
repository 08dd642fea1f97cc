"""S-CIELAB perceptual model: filter bank + forward transform."""
from .filters import ScielabFilters, build_filters, samples_per_degree
from .transform import srgb_to_scielab, scielab_filter_opp, opp_to_scielab

__all__ = [
    "ScielabFilters",
    "build_filters",
    "samples_per_degree",
    "srgb_to_scielab",
    "scielab_filter_opp",
    "opp_to_scielab",
]
