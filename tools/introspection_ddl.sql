-- Shared DDL replayed into BOTH engines (graft via IntrospectDump,
-- DuckDB via check_introspection.py); the introspection relations'
-- outputs are then diffed shape-for-shape. One statement per line.
CREATE SCHEMA sales;
CREATE SCHEMA hr;
CREATE TABLE items (id INTEGER NOT NULL, name VARCHAR(64), price DECIMAL(12,2), added DATE, flag BOOLEAN);
CREATE TABLE sales.orders2 (okey BIGINT NOT NULL, total DOUBLE, placed TIMESTAMP, qty SMALLINT);
CREATE TABLE hr.emp (eid INTEGER, ename VARCHAR(64) NOT NULL, wage DECIMAL(8,2));
CREATE VIEW v_items AS SELECT id, name FROM items;
CREATE VIEW sales.v_orders AS SELECT okey FROM sales.orders2;
