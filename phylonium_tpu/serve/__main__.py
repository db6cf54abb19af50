from phylonium_tpu.serve.daemon import serve

raise SystemExit(serve())
