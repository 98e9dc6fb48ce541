/* Mapperatorinator TPU web UI: form assembly, job lifecycle, SSE log
   streaming, cancellation, config persistence. Mirrors the reference's
   field contract (web-ui.py start_inference) over a stdlib-HTTP backend. */
(function () {
  const $ = (id) => document.getElementById(id);
  const form = $("inference-form");
  const log = $("log");
  const progress = $("progress");
  const generateBtn = $("generate-btn");
  const cancelBtn = $("cancel-btn");
  let jobId = null;
  let lastLogPath = null;

  function flash(message, cls) {
    const box = $("flash-container");
    if (!box) return;
    const div = document.createElement("div");
    div.className = "flash " + (cls || "info");
    div.textContent = message;
    box.appendChild(div);
    setTimeout(() => div.remove(), 6000);
  }

  function configStatus(message, cls) {
    const el = $("config-status");
    if (!el) return;
    el.textContent = message;
    el.className = cls || "ok";
    setTimeout(() => { el.textContent = ""; }, 4000);
  }

  function applyConfig(saved) {
    for (const [k, v] of Object.entries(saved)) {
      const el = form.elements[k];
      if (!el || el instanceof RadioNodeList) continue;
      if (el.type === "checkbox") el.checked = !!v;
      else el.value = v;
    }
    updateConditionalFields();
  }

  /* Per-job progress cards (reference ProgressManager, static/app.js:
     1050-1310: one card per job with its own progress bar, throughput
     readout, log, links, and cancel). */
  function basename(p) { return (p || "").split(/[\\/]+/).pop(); }

  function createCard(name) {
    const card = document.createElement("div");
    card.className = "progress-card";
    const header = document.createElement("div");
    header.className = "progress-card-header";
    const title = document.createElement("span");
    title.className = "progress-card-title";
    title.textContent = name;
    const cancel = document.createElement("button");
    cancel.type = "button";
    cancel.className = "cancel-button";
    cancel.textContent = i18n.t("action.cancel", "Cancel");
    header.appendChild(title);
    header.appendChild(cancel);
    const bar = document.createElement("progress");
    bar.max = 100;
    bar.value = 0;
    const status = document.createElement("div");
    status.className = "progress-card-status";
    const throughput = document.createElement("div");
    throughput.className = "progress-card-throughput";
    throughput.style.display = "none";
    const pre = document.createElement("pre");
    pre.className = "progress-card-log";
    const links = document.createElement("div");
    links.className = "progress-card-links";
    links.style.display = "none";
    card.append(header, bar, status, throughput, pre, links);
    progress.prepend(card);
    return { card, bar, status, throughput, pre, links, cancel, title };
  }

  function cardAppend(ui, line, cls) {
    const span = document.createElement("span");
    if (cls) span.className = cls;
    span.textContent = line + "\n";
    ui.pre.appendChild(span);
    ui.pre.scrollTop = ui.pre.scrollHeight;
    const m = /(\d{1,3})%/.exec(line);
    if (m) ui.bar.value = Math.min(100, parseInt(m[1], 10));
    // throughput readout (reference progress-card-throughput): surface any
    // tokens/s figure the worker logs
    const t = /([\d.]+)\s*(tokens?\/s|tok\/s|it\/s)/i.exec(line);
    if (t) {
      ui.throughput.style.display = "";
      ui.throughput.textContent = `${t[1]} ${t[2]}`;
    }
  }

  async function populateModels() {
    const res = await fetch("/models");
    const names = res.ok ? await res.json() : ["v32"];
    const sel = $("model-select");
    sel.innerHTML = "";
    for (const n of names) {
      const opt = document.createElement("option");
      opt.value = n;
      opt.textContent = n;
      sel.appendChild(opt);
    }
    if (names.includes("v32")) sel.value = "v32";
  }

  async function populateDescriptors() {
    const res = await fetch("/descriptors");
    if (!res.ok) return;
    const sets = await res.json();
    const groups = (sets.user_tags && sets.user_tags.groups.length
      ? sets.user_tags : (sets.omdb || { groups: [] })).groups;
    for (const id of ["descriptors", "negative_descriptors"]) {
      const sel = $(id);
      sel.innerHTML = "";
      for (const g of groups) {
        const og = document.createElement("optgroup");
        og.label = g.title;
        for (const item of g.items) {
          const opt = document.createElement("option");
          opt.value = item.value;
          opt.textContent = item.label;
          if (item.title) opt.title = item.title;
          og.appendChild(opt);
        }
        sel.appendChild(og);
      }
    }
  }

  function restoreConfig() {
    let saved = {};
    try { saved = JSON.parse(localStorage.getItem("mapp_config") || "{}"); } catch (e) {}
    applyConfig(saved);
  }

  function currentConfig() {
    const data = {};
    for (const el of form.elements) {
      if (!el.name) continue;
      if (el.type === "checkbox") data[el.name] = el.checked;
      else if (!el.multiple) data[el.name] = el.value;
    }
    return data;
  }

  function formData() {
    const fd = new FormData(form);
    return fd;
  }

  function persistConfig() {
    localStorage.setItem("mapp_config", JSON.stringify(currentConfig()));
  }

  function streamToCard(ui, id, outputPath) {
    const src = new EventSource(`/stream_output?job_id=${id}`);
    const finish = (text, cls) => {
      ui.status.textContent = text;
      if (cls) ui.status.className = `progress-card-status ${cls}`;
      ui.cancel.disabled = true;
      src.close();
    };
    src.onmessage = (ev) => {
      if (ev.data === "__DONE__") {
        ui.bar.value = 100;
        finish(i18n.t("status.done", "Done."), "ok");
        if (outputPath) {
          const link = document.createElement("a");
          link.href = "#";
          link.className = "open-folder-link";
          link.textContent = i18n.t("action.open_output", "Open output folder");
          link.addEventListener("click", async (e) => {
            e.preventDefault();
            await fetch("/open_folder", {
              method: "POST",
              body: new URLSearchParams({ path: outputPath }),
            });
          });
          ui.links.appendChild(link);
          ui.links.style.display = "";
        }
      } else if (ev.data.startsWith("__ERROR__")) {
        cardAppend(ui, ev.data.slice(9), "err");
        finish(i18n.t("status.error", "Error: ") + ev.data.slice(9).slice(0, 120), "err");
      } else {
        cardAppend(ui, ev.data);
      }
    };
    src.onerror = () => finish(i18n.t("status.error", "Error: ") + "stream lost", "err");
    return src;
  }

  form.addEventListener("submit", async (e) => {
    e.preventDefault();
    persistConfig();
    const model = form.elements.model ? form.elements.model.value : "";
    const name = `${basename(form.elements.audio_path.value) || basename(form.elements.beatmap_path.value) || "job"} · ${model}`;
    const ui = createCard(name);
    ui.status.textContent = i18n.t("status.started", "Generation started...");
    const outputPath = form.elements.output_path ? form.elements.output_path.value : "";
    const res = await fetch("/start_inference", { method: "POST", body: new URLSearchParams(formData()) });
    const out = await res.json();
    if (out.status !== "success") {
      cardAppend(ui, out.message || "unknown", "err");
      ui.status.textContent = i18n.t("status.error", "Error: ") + (out.message || "unknown");
      ui.status.className = "progress-card-status err";
      ui.cancel.disabled = true;
      return;
    }
    jobId = out.job_id;
    lastLogPath = out.log_path || null;
    $("open-log-btn").disabled = !lastLogPath;
    const src = streamToCard(ui, out.job_id, outputPath);
    ui.cancel.addEventListener("click", async () => {
      await fetch("/cancel_inference", {
        method: "POST",
        body: new URLSearchParams({ job_id: out.job_id }),
      });
      cardAppend(ui, i18n.t("status.cancelled", "Cancelled."));
      ui.status.textContent = i18n.t("status.cancelled", "Cancelled.");
      ui.cancel.disabled = true;
      src.close();
    });
  });

  // global cancel: acts on the most recently started job (per-card cancel
  // buttons handle individual jobs)
  cancelBtn.addEventListener("click", async () => {
    if (!jobId) return;
    await fetch("/cancel_inference", {
      method: "POST",
      body: new URLSearchParams({ job_id: jobId }),
    });
  });

  /* Path validation + autofill placeholders (reference ValidationManager,
     static/app.js:381-470: blur on a path field posts /validate_paths; a
     success response carries compile_args' autofilled values, shown as
     placeholders; errors render inline). */
  const PLACEHOLDER_FIELDS = [
    "audio_path", "output_path", "beatmap_path", "gamemode", "difficulty",
    "title", "title_unicode", "artist", "artist_unicode", "creator",
    "version", "preview_time", "source", "tags", "hp_drain_rate",
    "circle_size", "approach_rate", "overall_difficulty",
    "slider_multiplier", "slider_tick_rate", "hold_note_ratio",
    "scroll_speed_ratio", "mapper_id",
  ];

  async function validateAndAutofill() {
    const body = new FormData();
    for (const k of ["audio_path", "output_path", "beatmap_path"]) {
      body.append(k, form.elements[k] ? form.elements[k].value : "");
    }
    const model = form.elements.model ? form.elements.model.value : "";
    if (model) body.append("model", model);
    let out;
    try {
      const res = await fetch("/validate_paths", { method: "POST", body: new URLSearchParams(body) });
      out = await res.json();
    } catch (e) {
      return false;
    }
    const el = $("path-status");
    if (out.success) {
      for (const name of PLACEHOLDER_FIELDS) {
        const input = form.elements[name];
        if (!input || input instanceof RadioNodeList || input.multiple) continue;
        const v = out.autofilled_args ? out.autofilled_args[name] : null;
        if ("placeholder" in input) input.placeholder = v === null || v === undefined ? "" : String(v);
      }
      if (el) { el.textContent = i18n.t("status.paths_ok", "paths ok"); el.className = "ok"; }
    } else {
      for (const name of PLACEHOLDER_FIELDS) {
        const input = form.elements[name];
        if (input && "placeholder" in input && !(input instanceof RadioNodeList)) input.placeholder = "";
      }
      if (el) {
        el.textContent = (out.errors || []).join("; ") || i18n.t("status.paths_bad", "invalid paths");
        el.className = "err";
      }
    }
    return !!out.success;
  }

  $("validate-paths").addEventListener("click", validateAndAutofill);
  for (const k of ["audio_path", "output_path", "beatmap_path"]) {
    const input = form.elements[k];
    if (input) input.addEventListener("blur", validateAndAutofill);
  }

  $("save-config-btn").addEventListener("click", async () => {
    persistConfig();
    await fetch("/save_config", { method: "POST", body: new URLSearchParams(formData()) });
    configStatus(i18n.t("status.config_saved", "config saved"));
  });

  // config portability (reference: export-config-btn / import-config-input /
  // reset-config-btn, static/app.js)
  $("export-config-btn").addEventListener("click", () => {
    const blob = new Blob([JSON.stringify(currentConfig(), null, 2)],
                          { type: "application/json" });
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    a.download = "mapperatorinator_config.json";
    a.click();
    URL.revokeObjectURL(a.href);
    configStatus(i18n.t("status.config_exported", "config exported"));
  });

  $("import-config-btn").addEventListener("click", () => $("import-config-input").click());
  $("import-config-input").addEventListener("change", async (ev) => {
    const file = ev.target.files[0];
    if (!file) return;
    try {
      applyConfig(JSON.parse(await file.text()));
      persistConfig();
      configStatus(i18n.t("status.config_imported", "config imported"));
    } catch (e) {
      configStatus(i18n.t("status.config_invalid", "invalid config file"), "err");
      flash(String(e), "err");
    }
    ev.target.value = "";
  });

  $("reset-config-btn").addEventListener("click", () => {
    localStorage.removeItem("mapp_config");
    form.reset();
    $("gamemode").dispatchEvent(new Event("change"));
    configStatus(i18n.t("status.config_reset", "config reset"));
  });

  $("open-log-btn").addEventListener("click", async () => {
    if (!lastLogPath) return;
    const body = new FormData();
    body.append("path", lastLogPath);
    const res = await fetch("/open_log_file", { method: "POST", body: new URLSearchParams(body) });
    const out = await res.json();
    if (out.status !== "success") flash(out.message || "could not open log", "err");
  });

  $("open-folder-btn").addEventListener("click", async () => {
    const body = new FormData();
    body.append("path", form.elements.output_path.value);
    await fetch("/open_folder", { method: "POST", body: new URLSearchParams(body) });
  });

  /* Conditional field visibility (reference UIManager.updateConditionalFields
     + updateModelSettings, static/app.js:185-290): declarative
     data-show-for-gamemode / data-hide-for-model attributes on
     .conditional-field wrappers, beatmap-path-dependent context options, and
     the v30 gamemode lock. */
  function updateConditionalFields() {
    const gm = $("gamemode").value;
    const model = $("model-select").value;
    const beatmap = form.elements.beatmap_path ? form.elements.beatmap_path.value.trim() : "";

    document.querySelectorAll(".conditional-field[data-show-for-gamemode]").forEach((el) => {
      const modes = el.dataset.showForGamemode.split(",");
      el.style.display = modes.includes(gm) ? "" : "none";
    });
    document.querySelectorAll(".conditional-field[data-hide-for-model]").forEach((el) => {
      const hidden = el.dataset.hideForModel.split(",");
      el.style.display = hidden.includes(model) ? "none" : "";
    });

    // beatmap-path-dependent fields; hiding unchecks the toggles so a
    // cleared reference path can't silently keep add_to_beatmap active
    const showBeatmapFields = beatmap !== "";
    for (const id of ["in-context-options", "add-to-beatmap-option", "overwrite-reference-beatmap-option"]) {
      const el = $(id);
      if (!el) continue;
      el.style.display = showBeatmapFields ? "" : "none";
    }
    if (!showBeatmapFields) {
      if ($("add_to_beatmap")) $("add_to_beatmap").checked = false;
      if ($("overwrite_reference_beatmap")) $("overwrite_reference_beatmap").checked = false;
    }

    // v30 is osu!standard-only: force and lock the gamemode select
    const gmSel = $("gamemode");
    if (model === "v30") {
      if (gmSel.value !== "0") {
        gmSel.value = "0";
        updateConditionalFields();
        return;
      }
      gmSel.disabled = true;
    } else {
      gmSel.disabled = false;
    }
  }

  $("gamemode").addEventListener("change", updateConditionalFields);
  $("model-select").addEventListener("change", updateConditionalFields);
  if (form.elements.beatmap_path) {
    form.elements.beatmap_path.addEventListener("input", updateConditionalFields);
    form.elements.beatmap_path.addEventListener("blur", updateConditionalFields);
  }

  populateModels().then(updateConditionalFields);
  populateDescriptors();
  restoreConfig();
  updateConditionalFields();
})();
