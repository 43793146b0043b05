from .tree import (
    COMPOSITE,
    FREE_FLYER,
    HELICAL,
    PLANAR,
    PRISMATIC,
    REVOLUTE,
    REVOLUTE_UNBOUNDED,
    SPHERICAL,
    SPHERICAL_ZYX,
    TRANSLATION,
    UNIVERSAL,
    KinematicTree,
    make_tree,
)
from .urdf import load_urdf
from . import robots

__all__ = [
    "KinematicTree",
    "make_tree",
    "load_urdf",
    "robots",
    "REVOLUTE",
    "PRISMATIC",
    "FREE_FLYER",
    "SPHERICAL",
    "SPHERICAL_ZYX",
    "REVOLUTE_UNBOUNDED",
    "TRANSLATION",
    "PLANAR",
    "UNIVERSAL",
    "HELICAL",
    "COMPOSITE",
]
