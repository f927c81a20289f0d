"""Ray Data stages: batch transforms and actor-pool callables.

Stage tiers (SURVEY.md §7.2): stateless tasks for classification /
normalization / chunk explode, actor pools for the stateful extractors,
groupby shuffles only for dedup.
"""
