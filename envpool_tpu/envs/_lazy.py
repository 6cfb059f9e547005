"""PEP-562 lazy export machinery for env family packages.

The reference imports each family's pybind module lazily at ``make()``
time (``envpool/registration.py:231,280``) so that ``import envpool`` is
O(registry size), not O(all simulators).  Our analog: each family
``__init__.py`` declares an ``{export name -> submodule}`` table and
installs a module-level ``__getattr__`` so the env module is only
imported when the registry actually resolves ``env_cls`` at make() time.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable, Mapping


def lazy_exports(
    package: str, exports: Mapping[str, str]
) -> tuple[Callable[[str], object], Callable[[], list[str]], list[str]]:
    """Return ``(__getattr__, __dir__, __all__)`` for a family package.

    ``exports`` maps attribute name -> submodule (relative, no dot).
    """
    names = sorted(exports)

    def __getattr__(name: str) -> object:
        try:
            submodule = exports[name]
        except KeyError:
            raise AttributeError(
                f"module {package!r} has no attribute {name!r}"
            ) from None
        module = importlib.import_module(f".{submodule}", package)
        return getattr(module, name)

    def __dir__() -> list[str]:
        return names

    return __getattr__, __dir__, list(names)
