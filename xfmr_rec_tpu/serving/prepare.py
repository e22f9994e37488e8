"""Package a trained model into a serving artifact and smoke-test it.

Parity with the reference packaging flow
(/root/reference/xfmr_rec/bentoml/prepare.py): train (or restore), save
the artifact, instantiate the full service in-process, and run
golden-value integration checks over the endpoint surface
(bentoml/prepare.py:75-111).
"""

from __future__ import annotations

import logging
import pathlib

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.serving.engine import RecommenderEngine
from xfmr_rec_tpu.serving.schemas import ItemQuery, Query, UserQuery
from xfmr_rec_tpu.serving.service import RecService, dispatch
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

logger = logging.getLogger(__name__)


def prepare_artifact(
    artifact_dir: str | pathlib.Path,
    *,
    config: TrainConfig | None = None,
    data_config: DataConfig | None = None,
    trainer_config: TrainerConfig | None = None,
    ckpt_name: str | None = None,
    fast_dev_run: bool = True,
) -> pathlib.Path:
    """Train (or restore `ckpt_name`) and write the serving artifact."""
    trainer = Trainer(
        config or TrainConfig(),
        data=RecDataModule(data_config or DataConfig()),
        trainer_config=trainer_config
        or TrainerConfig(
            limit_train_batches=1 if fast_dev_run else None,
            limit_val_batches=1 if fast_dev_run else None,
        ),
    )
    if ckpt_name:
        trainer.restore_checkpoint(ckpt_name)
    else:
        trainer.fit()
    trainer.save(artifact_dir)
    return pathlib.Path(artifact_dir)


def test_queries(service: RecService) -> None:
    """Golden-value integration checks over the endpoint surface."""
    # meta endpoints
    assert isinstance(dispatch(service, "model_name", {}), str)
    assert isinstance(dispatch(service, "model_version", {}), str)

    # item lookups round-trip through their own store
    item = service.item_id(1)
    assert item.movie_id == 1
    assert item.movie_text
    processed = service.process_item(item)
    assert processed.text == item.movie_text

    user = service.user_id(1)
    assert user.user_id == 1
    assert user.user_text
    assert service.process_user(user).text == user.user_text

    # embedding
    query = service.embed_query(Query(text=item.movie_text))
    assert query.embedding is not None and len(query.embedding) > 0

    # every recommend endpoint returns parseable candidates
    for endpoint, payload in [
        ("recommend_with_query", {"query": {"text": user.user_text}}),
        ("recommend_with_item", {"item": item.model_dump()}),
        ("recommend_with_item_id", {"item_id": 1}),
        ("recommend_with_user", {"user": user.model_dump()}),
        ("recommend_with_user_id", {"user_id": 1}),
    ]:
        result = dispatch(service, endpoint, {**payload, "top_k": 5})
        assert isinstance(result, list) and len(result) == 5, endpoint
        for candidate in result:
            assert {"movie_id", "movie_text", "score"} <= set(candidate)

    # self/history exclusion behavior
    recs = service.recommend_with_item_id(1, top_k=5)
    assert all(c.movie_id != 1 for c in recs)
    history_ids = {a.movie_id for a in (user.history or [])}
    target_ids = {a.movie_id for a in (user.target or [])}
    recs = service.recommend_with_user_id(1, top_k=5)
    assert not ({c.movie_id for c in recs} & (history_ids | target_ids))
    logger.info("serving golden-value checks passed")


def main(
    artifact_dir: str = "artifact",
    *,
    serve: bool = False,
    port: int = 8000,
    index_kind: str = "exact",
    nprobe: int = 8,
    allow_catalog_mutation: bool = False,
) -> None:
    logging.basicConfig(level=logging.INFO)
    path = pathlib.Path(artifact_dir)
    if not (path / "processors.json").exists():
        prepare_artifact(path)
    engine = RecommenderEngine(path, index_kind=index_kind, nprobe=nprobe)
    service = RecService(
        engine, allow_catalog_mutation=allow_catalog_mutation
    )
    test_queries(service)
    if serve:
        from xfmr_rec_tpu.serving.service import serve_forever

        serve_forever(service, port=port)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact_dir", default="artifact")
    parser.add_argument("--serve", action="store_true")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument(
        "--index_kind", choices=["exact", "ivf", "sharded"], default="exact",
        help="item search path: exhaustive exact (one chip), IVF probe "
        "(ANN), or exact sharded over the device mesh",
    )
    parser.add_argument("--nprobe", type=int, default=8)
    parser.add_argument(
        "--allow-catalog-mutation", action="store_true",
        help="expose the add_items live-catalog endpoint (admin surface; "
        "off by default — any client of the port could otherwise mutate "
        "the catalog and force recompiles)",
    )
    args = parser.parse_args()
    main(
        args.artifact_dir,
        serve=args.serve,
        port=args.port,
        index_kind=args.index_kind,
        nprobe=args.nprobe,
        allow_catalog_mutation=args.allow_catalog_mutation,
    )
