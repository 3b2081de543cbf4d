from .tree import Epochs, Trees, epochs_from_demography, make_initial_trees  # noqa: F401
from .likelihood import site_likelihood  # noqa: F401
from .transition import recombination_transition  # noqa: F401
