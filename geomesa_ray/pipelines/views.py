"""Merged / routed dataset views (MergedDataStoreView.scala +
RouteSelectorByAttribute.scala analogs).

A merged view unions several stores' datasets; a routed view picks ONE
store per query by an attribute predicate, avoiding the union read when
the router can decide.
"""

from __future__ import annotations

from typing import Callable

import ray.data


def merged_view(datasets: list[ray.data.Dataset]) -> ray.data.Dataset:
    """Union of stores (MergedDataStoreView): results stream from all."""
    if not datasets:
        raise ValueError("need at least one dataset")
    if len(datasets) == 1:
        return datasets[0]
    return datasets[0].union(*datasets[1:])


class RoutedView:
    """Route a query to one named store by attribute
    (RouteSelectorByAttribute analog): ``router(attrs) -> store name`` with
    fallback to the merged view when routing is undecidable."""

    def __init__(self, stores: dict[str, ray.data.Dataset],
                 router: Callable[[dict], str | None]):
        self.stores = stores
        self.router = router

    def query(self, attrs: dict) -> ray.data.Dataset:
        name = self.router(attrs)
        if name is not None:
            if name not in self.stores:
                raise KeyError(f"router chose unknown store {name!r}")
            return self.stores[name]
        return merged_view(list(self.stores.values()))
