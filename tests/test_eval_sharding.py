"""Index-range sharded inference == single-pass inference (the
reference's multi-GPU subprocess contract, test_engine.py:204-244)."""
import numpy as np
import pytest

from cim_tpu.parallel import eval_index_range, merge_sharded_results


def test_eval_index_range_partitions_exactly():
    n = 103
    seen = []
    for pi in range(4):
        s, e = eval_index_range(n, process_index=pi, process_count=4)
        seen.extend(range(s, e))
    assert seen == list(range(n))


def test_merge_sharded_results():
    shards = [
        {"a.jpg": {"scores": 1}},
        {"b.jpg": {"scores": 2}},
        {"c.jpg": {"scores": 3}},
    ]
    merged = merge_sharded_results(shards)
    assert set(merged) == {"a.jpg", "b.jpg", "c.jpg"}


def test_range_sharded_test_net_matches_full(synth_dataset_factory=None):
    # reuse the synthetic dataset fixture machinery from test_eval_pipeline
    pytest.importorskip("cv2")
    import jax

    from tests.test_eval_pipeline import _cfg, synth_dataset  # noqa: F401
    from cim_tpu.engine.test_engine import test_net
    from cim_tpu.engine.train import Trainer
    from cim_tpu.data.synthetic import make_microbatch

    rng = np.random.RandomState(0)
    # build the dataset manually (fixture body inlined via request is
    # messy; replicate with tmpdir)
    import tempfile, pathlib, json, pickle
    from cim_tpu.data import catalog
    from cim_tpu.data.synthetic import masks_to_7x7, synthetic_masks

    tmp = pathlib.Path(tempfile.mkdtemp())
    n_images, n_props = 4, 16
    images = []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    for i in range(n_images):
        images.append({"id": i + 1, "width": 96, "height": 64,
                       "file_name": f"{i}.jpg"})
        masks, boxes = synthetic_masks(rng, n_props, 64, 96)
        prop["indexes"].append(i + 1)
        prop["boxes"].append(boxes)
        prop["masks"].append(masks_to_7x7(masks, boxes).astype(np.float32))
        prop["scores"].append(rng.rand(n_props).astype(np.float32))
    ann = {"images": images, "annotations": [], "categories":
           [{"id": c + 1, "name": f"c{c}"} for c in range(20)]}
    (tmp / "ann.json").write_text(json.dumps(ann))
    with open(tmp / "props.pkl", "wb") as f:
        pickle.dump(prop, f)
    catalog.register_dataset(
        "synth_shard", {catalog.IM_DIR: str(tmp), catalog.ANN_FN: str(tmp / "ann.json")}
    )

    cfg = _cfg(tmp)
    cfg.TEST.DATASETS = ("synth_shard",)
    cfg.TEST.BBOX_AUG.ENABLED = False
    cfg.TEST.SCALE = 64

    sample = make_microbatch(rng, image_hw=(64, 64), n_props=16, n_valid=16)
    saved = cfg.TPU.PROPOSAL_PAD
    cfg.TPU.PROPOSAL_PAD = 16
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    cfg.TPU.PROPOSAL_PAD = saved
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    def image_loader(entry):
        r = np.random.RandomState(entry["id"])
        return (r.rand(entry["height"], entry["width"], 3) * 255).astype(np.uint8)

    full, _, _ = test_net(
        cfg, trainer.model, variables, "synth_shard", str(tmp / "props.pkl"),
        str(tmp / "out_full"), image_loader=image_loader,
    )
    shards = []
    for pi in range(2):
        rng_range = eval_index_range(n_images, process_index=pi, process_count=2)
        part, _, _ = test_net(
            cfg, trainer.model, variables, "synth_shard",
            str(tmp / "props.pkl"), str(tmp / "out_part"),
            ind_range=rng_range, image_loader=image_loader,
        )
        shards.append(part)
    merged = merge_sharded_results(shards)
    assert set(merged) == set(full)
    for k in full:
        np.testing.assert_allclose(
            merged[k]["scores"], full[k]["scores"], rtol=1e-5
        )
