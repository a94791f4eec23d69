"""End-to-end quickstart: dataset -> embed -> index -> search -> analyze -> train.

Runs self-contained (synthetic images, deterministic encoder unless
--real-clip). Mirrors the reference's full capability surface in ~1 minute:

    python examples/quickstart.py --workdir /tmp/irq
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/image_retrieval_quickstart")
    ap.add_argument("--real-clip", action="store_true",
                    help="Use the full ViT-B/32 (deterministic init) instead "
                         "of the fake encoder")
    ap.add_argument("--train-steps", type=int, default=3)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    # 1) Build a color-controlled dataset (synthetic; pass COCO paths to
    #    data.dataset.prepare_color_dataset for the real thing).
    from image_retrieval_tpu.data.dataset import prepare_color_dataset

    base = os.path.join(args.workdir, "color_dataset")
    pairs, metadata = prepare_color_dataset(base_dir=base, num_examples=3)
    print(f"[1] dataset: {len(metadata)} images, "
          f"{sum(len(v) for v in pairs.values())} pairs")

    # 2) Embed + index (sharded exact index over all local devices).
    from image_retrieval_tpu.app.embed import ImageEmbeddingSystem
    from image_retrieval_tpu.models.encoder import get_encoder

    encoder = get_encoder(fake=not args.real_clip)
    system = ImageEmbeddingSystem(encoder)
    ok, failed = system.process_and_store_images([m["path"] for m in metadata])
    print(f"[2] indexed {ok} images ({failed} failed) on mesh "
          f"{dict(zip(system.index.mesh.axis_names, system.index.mesh.devices.shape))}")

    # 3) Text search (standard + optimized weighted metric).
    from image_retrieval_tpu.app.search import TextImageSearcher

    searcher = TextImageSearcher(encoder, system.index)
    hits = searcher.search("a brown dog", top_k=3, score_threshold=-1e9)
    print(f"[3] search 'a brown dog': "
          f"{[os.path.relpath(h['path'], base) for h in hits]}")
    searcher.set_similarity_params(
        {"w_angle": 1.0, "w_l1": 1.0, "w_l2": 1.0, "w_inf": 0.0, "w_mag": 0.5}
    )
    hits_opt = searcher.search("a brown dog", top_k=3, score_threshold=0.0,
                               use_optimized_similarity=True)
    print(f"[3] optimized rerank returned {len(hits_opt)} hits")
    # image-as-query: rank the gallery by similarity to one of its own
    # images (the query's row is excluded from its results by default)
    sim = searcher.search_by_image(hits[0]["path"], top_k=3,
                                   score_threshold=-1e9)
    print(f"[3] similar to {os.path.relpath(hits[0]['path'], base)}: "
          f"{[os.path.relpath(h['path'], base) for h in sim]}")

    # 4) Full MI analysis (results.json + 8 plot artifacts).
    import numpy as np

    emb_file = os.path.join(args.workdir, "embeddings.npz")
    stored = {p: e * m for p, e, m in system.get_embeddings_with_magnitude(10**6)}
    np.savez(emb_file, embeddings=np.array(stored, dtype=object))
    from image_retrieval_tpu.analysis.color_mi import ColorMIAnalyzer

    an = ColorMIAnalyzer(base_dir=base)
    res = an.run_full_analysis(emb_file, os.path.join(args.workdir, "results"))
    best = max(res["results"]["general_mi"].items(), key=lambda kv: kv[1])
    print(f"[4] analysis: best general-MI metric = {best[0]} ({best[1]:.4f})")

    # 5) Contrastive fine-tuning (dp x tp over the local mesh).
    import dataclasses

    from image_retrieval_tpu.config import ModelConfig
    from image_retrieval_tpu.train import CLIPTrainer, finetune_on_color_dataset

    tiny = dataclasses.replace(
        ModelConfig(), vision_layers=2, text_layers=2, vision_width=64,
        vision_heads=4, text_width=32, text_heads=2, embed_dim=32,
        context_length=16, dtype="float32",
    )
    trainer = CLIPTrainer(cfg=tiny, learning_rate=3e-4)
    losses = finetune_on_color_dataset(trainer, base, batch_size=8,
                                       steps=args.train_steps)
    print(f"[5] train: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"in {len(losses)} steps")
    print("QUICKSTART COMPLETE")


if __name__ == "__main__":
    main()
