"""paper2table_ray — a Ray-Data-native document/table extraction engine.

A from-scratch reimplementation of the *capabilities* of
SFBioinformaticsGroup/paper2table (reference at /root/reference, studied for
behavior only) as a streaming Ray Data pipeline over tables of interleaved
text + media documents:

    (doc_id: string,
     spans: list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>)

Every stage is a ``Dataset.map_batches`` over Arrow batches; stateful stages
(layout parsers, similarity scorers) are actor pools; the only all-to-all
shuffles are the per-document merge ``groupby("doc_id")`` and explicitly
chosen dedup/sort keys.  See SURVEY.md for the operator inventory and the
file:line citations into the reference for every behavior we match.
"""

__version__ = "0.1.0"
