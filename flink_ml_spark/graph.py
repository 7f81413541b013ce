"""Graph / GraphBuilder / GraphModel — DAG composition of stages.

Reference: ml/builder/GraphBuilder.java:39 (addAlgoOperator :98),
Graph.java:153, GraphModel.java:50, topo execution in
GraphExecutionHelper.java.  No Spark builtin — a pure-Python DAG executor
over DataFrames (SURVEY §2.1): tables are symbolic ``TableId``s wired
between stages; ``Graph`` acts as an Estimator (fits each Estimator node
in topological order, like Pipeline but non-linear), ``GraphModel`` as
the composed Transformer.  DataFrames stay lazy — executing the DAG only
builds the combined logical plan.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .api import AlgoOperator, Estimator, Model, Stage


@dataclass(frozen=True)
class TableId:
    id: int


@dataclass
class GraphNode:
    stage: Stage
    inputs: list[TableId]
    outputs: list[TableId]
    estimator_inputs: list[TableId] | None = None  # fit inputs if different
    input_model_data: list[TableId] | None = None   # setModelData() tables
    output_model_data: list[TableId] | None = None  # getModelData() tables


class GraphBuilder:
    def __init__(self):
        self._next = 0
        self.nodes: list[GraphNode] = []

    def new_table_id(self) -> TableId:
        self._next += 1
        return TableId(self._next)

    def new_table_ids(self, n: int) -> list[TableId]:
        return [self.new_table_id() for _ in range(n)]

    def add_algo_operator(self, op: AlgoOperator, inputs: list[TableId],
                          n_outputs: int = 1) -> list[TableId]:
        outs = self.new_table_ids(n_outputs)
        self.nodes.append(GraphNode(op, list(inputs), outs))
        return outs

    def add_estimator(self, est: Estimator, inputs: list[TableId],
                      transform_inputs: list[TableId] | None = None,
                      n_outputs: int = 1) -> list[TableId]:
        """fit ``est`` on ``inputs``; the fitted model transforms
        ``transform_inputs`` (default: same tables) → outputs."""
        outs = self.new_table_ids(n_outputs)
        self.nodes.append(GraphNode(est, list(transform_inputs or inputs), outs,
                                    estimator_inputs=list(inputs)))
        return outs

    def _node_of(self, stage: Stage) -> GraphNode:
        for n in self.nodes:
            if n.stage is stage:
                return n
        raise ValueError("the stage has not been added to the graph")

    def set_model_data(self, stage: Stage, *inputs: TableId) -> None:
        """Wire ``inputs`` into ``setModelData()`` of the given stage's
        (fitted) model before its transform() runs — reference
        GraphBuilder.java:161-175 (setModelDataOnEstimator) and :185-205
        (setModelDataOnModel)."""
        node = self._node_of(stage)
        if node.input_model_data is not None:
            raise ValueError("the model data of this stage has already been set")
        node.input_model_data = list(inputs)

    def get_model_data(self, stage: Stage, n_tables: int = 1) -> list[TableId]:
        """TableIds bound to ``getModelData()`` of the given stage's
        (fitted) model — reference GraphBuilder.java:216-239
        (getModelDataFromEstimator) and :241-269 (getModelDataFromModel).
        Downstream nodes can consume them like any other table."""
        node = self._node_of(stage)
        if node.output_model_data is not None:
            raise ValueError("the model data of this stage has already been fetched")
        node.output_model_data = self.new_table_ids(n_tables)
        return node.output_model_data

    def build_estimator(self, inputs: list[TableId],
                        outputs: list[TableId]) -> "Graph":
        return Graph(self.nodes, inputs, outputs)

    def build_algo_operator(self, inputs: list[TableId],
                            outputs: list[TableId]) -> "GraphAlgoOperator":
        """Wrap the nodes as an AlgoOperator (GraphBuilder.java:359):
        estimator nodes fit AND transform inside each call."""
        return GraphAlgoOperator(self.nodes, inputs, outputs)


def _run_model_stage(stage: Stage, node: GraphNode,
                     env: dict) -> list[DataFrame]:
    """Transform one node's (fitted) stage honoring model-data edges:
    setModelData before transform, getModelData bound after (reference
    GraphModel.java:50 execution contract)."""
    if node.input_model_data:
        stage.set_model_data(*[env[t] for t in node.input_model_data])
    outs = stage.transform(*[env[t] for t in node.inputs])
    for tid, df in zip(node.outputs, outs):
        env[tid] = df
    if node.output_model_data:
        spark = next(iter(env.values())).sparkSession
        for tid, df in zip(node.output_model_data, stage.get_model_data(spark)):
            env[tid] = df
    return outs


class Graph(Estimator):
    def __init__(self, nodes=None, inputs=None, outputs=None, **kwargs):
        super().__init__(**kwargs)
        self.nodes = list(nodes or [])
        self.input_ids = list(inputs or [])
        self.output_ids = list(outputs or [])

    def fit(self, *tables: DataFrame) -> "GraphModel":
        env: dict[TableId, DataFrame] = dict(zip(self.input_ids, tables))
        fitted_nodes: list[GraphNode] = []
        for node in _topo_order(self.nodes, set(env)):
            if isinstance(node.stage, Estimator):
                fit_ins = [env[t] for t in (node.estimator_inputs or node.inputs)]
                stage = node.stage.fit(*fit_ins)
            else:
                stage = node.stage
            _run_model_stage(stage, node, env)
            fitted_nodes.append(GraphNode(
                stage, node.inputs, node.outputs,
                input_model_data=node.input_model_data,
                output_model_data=node.output_model_data))
        return GraphModel(fitted_nodes, self.input_ids, self.output_ids)

    def save(self, path: str) -> None:
        _save_graph(self, self.nodes, self.input_ids, self.output_ids, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Graph":
        return cls(*_load_graph(spark, path))


class GraphModel(Model):
    def __init__(self, nodes=None, inputs=None, outputs=None, **kwargs):
        super().__init__(**kwargs)
        self.nodes = list(nodes or [])
        self.input_ids = list(inputs or [])
        self.output_ids = list(outputs or [])

    def transform(self, *tables: DataFrame) -> list[DataFrame]:
        env: dict[TableId, DataFrame] = dict(zip(self.input_ids, tables))
        for node in _topo_order(self.nodes, set(env)):
            _run_model_stage(node.stage, node, env)
        return [env[t] for t in self.output_ids]

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.transform(df)[0]

    def transform_local(self, *pdfs):
        """Serve the DAG pandas-locally (single-input stages only; graphs
        with model-data edges need the engine path).  Returns one pandas
        frame per graph output — or the frame itself for the common
        1-output case."""
        env = dict(zip(self.input_ids, pdfs))
        for node in _topo_order(self.nodes, set(env)):
            if node.input_model_data or node.output_model_data:
                raise NotImplementedError(
                    "GraphModel.transform_local does not support model-data edges")
            if len(node.inputs) != 1 or len(node.outputs) != 1:
                raise NotImplementedError(
                    "GraphModel.transform_local supports single-input, "
                    "single-output stages only")
            env[node.outputs[0]] = node.stage.transform_local(env[node.inputs[0]])
        outs = [env[t] for t in self.output_ids]
        return outs[0] if len(outs) == 1 else outs

    def save(self, path: str) -> None:
        _save_graph(self, self.nodes, self.input_ids, self.output_ids, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GraphModel":
        return cls(*_load_graph(spark, path))

    @classmethod
    def load_local(cls, path: str) -> "GraphModel":
        """Engine-free load of a saved GraphModel (serves transform_local)."""
        return cls(*_load_graph(None, path, local=True))


class GraphAlgoOperator(AlgoOperator):
    """The graph wrapped as an AlgoOperator (GraphBuilder.java:359,
    buildAlgoOperator): every transform() fits estimator nodes inline on
    their estimator inputs, then runs the fitted models."""

    def __init__(self, nodes=None, inputs=None, outputs=None, **kwargs):
        super().__init__(**kwargs)
        self.nodes = list(nodes or [])
        self.input_ids = list(inputs or [])
        self.output_ids = list(outputs or [])

    def transform(self, *tables: DataFrame) -> list[DataFrame]:
        env: dict[TableId, DataFrame] = dict(zip(self.input_ids, tables))
        for node in _topo_order(self.nodes, set(env)):
            if isinstance(node.stage, Estimator):
                fit_ins = [env[t] for t in (node.estimator_inputs or node.inputs)]
                stage = node.stage.fit(*fit_ins)
            else:
                stage = node.stage
            _run_model_stage(stage, node, env)
        return [env[t] for t in self.output_ids]

    def save(self, path: str) -> None:
        _save_graph(self, self.nodes, self.input_ids, self.output_ids, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GraphAlgoOperator":
        return cls(*_load_graph(spark, path))


def _save_graph(owner: Stage, nodes, inputs, outputs, path: str) -> None:
    """Persist wiring as JSON + each stage in its own subdir (mirrors
    Graph.java GraphData save semantics)."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "className": f"{type(owner).__module__}.{type(owner).__qualname__}",
        "paramMap": {},
        "graph": {
            "inputs": [t.id for t in inputs],
            "outputs": [t.id for t in outputs],
            "nodes": [
                {
                    "inputs": [t.id for t in n.inputs],
                    "outputs": [t.id for t in n.outputs],
                    "estimatorInputs": ([t.id for t in n.estimator_inputs]
                                        if n.estimator_inputs else None),
                    "inputModelData": ([t.id for t in n.input_model_data]
                                       if n.input_model_data else None),
                    "outputModelData": ([t.id for t in n.output_model_data]
                                        if n.output_model_data else None),
                }
                for n in nodes
            ],
        },
    }
    with open(os.path.join(path, "metadata"), "w") as f:
        json.dump(meta, f)
    for i, n in enumerate(nodes):
        n.stage.save(os.path.join(path, "stages", f"{i:04d}"))


def _load_graph(spark: SparkSession | None, path: str, local: bool = False):
    with open(os.path.join(path, "metadata")) as f:
        meta = json.load(f)
    g = meta["graph"]
    nodes = []
    for i, nd in enumerate(g["nodes"]):
        sub = os.path.join(path, "stages", f"{i:04d}")
        stage = Stage.load_local(sub) if local else Stage.load(spark, sub)
        nodes.append(GraphNode(
            stage,
            [TableId(t) for t in nd["inputs"]],
            [TableId(t) for t in nd["outputs"]],
            [TableId(t) for t in nd["estimatorInputs"]]
            if nd.get("estimatorInputs") else None,
            input_model_data=[TableId(t) for t in nd["inputModelData"]]
            if nd.get("inputModelData") else None,
            output_model_data=[TableId(t) for t in nd["outputModelData"]]
            if nd.get("outputModelData") else None))
    inputs = [TableId(t) for t in g["inputs"]]
    outputs = [TableId(t) for t in g["outputs"]]
    return nodes, inputs, outputs


def _topo_order(nodes: list[GraphNode], ready: set) -> list[GraphNode]:
    """Kahn topological order over table dependencies
    (GraphExecutionHelper semantics)."""
    ready = set(ready)
    pending = list(nodes)
    ordered: list[GraphNode] = []
    while pending:
        progressed = False
        for node in list(pending):
            needs = (set(node.inputs) | set(node.estimator_inputs or [])
                     | set(node.input_model_data or []))
            if needs <= ready:
                ordered.append(node)
                ready |= set(node.outputs) | set(node.output_model_data or [])
                pending.remove(node)
                progressed = True
        if not progressed:
            raise ValueError("Graph has a cycle or unbound input tables")
    return ordered
