"""Console-script entry points (pyproject ``[project.scripts]``).

Each CLI's ``main()`` returns its result dict so tests and library
callers can assert on it; a setuptools console script ``sys.exit()``s
the return value, where a dict would read as failure.  These wrappers
run the CLI and discard the dict.
"""


def simple_tof() -> None:
    from . import simple_tof as m
    m.main()


def simult_fit() -> None:
    from . import simult_fit as m
    m.main()


def csi_onebd() -> None:
    from . import csi_onebd as m
    m.main()


def template_fit() -> None:
    from . import template_fit as m
    m.main()


def ppc() -> None:
    from . import ppc as m
    m.main()


def plot_chain() -> None:
    from . import plot_chain as m
    m.main()


def shifting_gaussian() -> None:
    from . import shifting_gaussian as m
    m.main()
